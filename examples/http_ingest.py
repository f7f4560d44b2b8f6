"""Ingest over http(s) — the engine rendition of the reference's
http-served recipes (``tests/http_auth_server.py`` + the
``gpcp_from_gcs``-style remote pull): netCDF files behind a
basic-auth + query-string-token web server, cached once through the
byte cache, combined along ``time``, written as Zarr v3; then the same
archive scanned into kerchunk references IN PLACE (header Range GETs —
no download) and read back through the virtual store.

Run: PYTHONPATH=/root/repo python examples/http_ingest.py
"""

from __future__ import annotations

import base64
import os
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from data_generation import make_ds

from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
from pangeo_forge_recipes_spark.hdf5io import write_hdf5
from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset
from pangeo_forge_recipes_spark.ndset import assert_equal
from pangeo_forge_recipes_spark.openers import open_with_kerchunk
from pangeo_forge_recipes_spark.patterns import FileType
from pangeo_forge_recipes_spark.session import get_spark

USER, PASSWORD, TOKEN = "forge", "hunter2", "tok123"


def serve(root: str, auth: bool = True) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _ok(self):
            parsed = urlparse(self.path)
            if auth:
                want = base64.b64encode(f"{USER}:{PASSWORD}".encode()).decode()
                if self.headers.get("Authorization") != f"Basic {want}":
                    self.send_response(401)
                    self.end_headers()
                    return None
                if dict(parse_qsl(parsed.query)).get("token") != TOKEN:
                    self.send_response(403)
                    self.end_headers()
                    return None
            p = os.path.join(root, parsed.path.lstrip("/"))
            if not os.path.isfile(p):
                self.send_response(404)
                self.end_headers()
                return None
            return p

        def do_HEAD(self):
            p = self._ok()
            if p:
                self.send_response(200)
                self.send_header("Content-Length", str(os.path.getsize(p)))
                self.end_headers()

        def do_GET(self):
            p = self._ok()
            if not p:
                return
            size = os.path.getsize(p)
            rng = self.headers.get("Range")
            with open(p, "rb") as f:
                if rng:
                    lo, hi = rng.split("=", 1)[1].split("-", 1)
                    lo, hi = int(lo), min(int(hi) if hi else size - 1, size - 1)
                    f.seek(lo)
                    body = f.read(hi - lo + 1)
                    self.send_response(206)
                    self.send_header("Content-Range", f"bytes {lo}-{hi}/{size}")
                else:
                    body = f.read()
                    self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="http_ingest_")
    www = os.path.join(work, "www")
    os.makedirs(www)

    ds = make_ds(nt=8)
    for i in range(4):
        write_hdf5(os.path.join(www, f"day_{i}.nc"), ds.isel(time=slice(2 * i, 2 * i + 2)))

    httpd = serve(www)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    urls = [f"{base}/day_{i}.nc" for i in range(4)]
    auth = {"auth": (USER, PASSWORD)}
    secrets = {"token": TOKEN}

    # 1) the cached pull: each source crosses the wire once into the
    #    byte cache; the pipeline then runs on local bytes
    pattern = pattern_from_file_sequence(urls, "time", nitems_per_file=2, file_type="netcdf4")
    result = store_to_zarr(
        spark, pattern, work, "remote.zarr",
        target_chunks={"time": 4},
        cache=os.path.join(work, "cache"),
        secrets=secrets,
        open_kwargs=auth,
    )
    assert_equal(result.open(), ds, check_attrs=False)
    print(f"wrote {result.path}: {result.n_chunks_written} chunks over http")

    # 2) kerchunk IN PLACE against a public (auth-free) endpoint — the
    #    open-bucket case: the scan walks HDF5 headers with Range GETs
    #    (no download) and the refs point at the remote urls
    pub = serve(www, auth=False)
    pub_url = f"http://127.0.0.1:{pub.server_address[1]}/day_0.nc"
    (refs,) = open_with_kerchunk(pub_url, FileType.netcdf4)
    back = open_reference_dataset(refs)
    assert_equal(back, ds.isel(time=slice(0, 2)), check_attrs=False)
    table = refs.get("refs", refs)
    print("kerchunk scan over http: refs point at", sorted(
        {v[0] for v in table.values() if isinstance(v, list)}
    ))

    pub.shutdown()
    httpd.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
