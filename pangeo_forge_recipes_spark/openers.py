"""File openers: url → bytes/local path → NDDataset or kerchunk references.

Parity layer for reference ``pangeo_forge_recipes/openers.py:16-254``.
Engine-native formats (``zarr``, ``npz``, ``netcdf3`` via the engine's own
pure-numpy classic reader in :mod:`..netcdf3`, ``netcdf4``/HDF5 via the
pure-Python byte-range scanner in :mod:`..hdf5io`, ``grib`` via the
pure-Python GRIB2 reader in :mod:`..grib2io`, ``opendap`` via the
pure-Python DAP2 wire client in :mod:`..dap2io`) open for real,
keeping the reference's engine-selection table (``openers.py:40-47``)
intact with every row live.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

from .aggregation import XarraySchema
from .dsio import npz_schema, open_zarr_group, read_npz, zarr_group_schema
from .ndset import NDDataset
from .patterns import FileType
from .storage import CacheFSSpecTarget, _add_query_string_secrets

# engine-per-file-type map, mirroring reference ``openers.py:40-47``
OPEN_ENGINES = {
    FileType.netcdf3: "native",  # engine-internal pure-numpy classic reader
    FileType.netcdf4: "native",  # engine-internal pure-Python HDF5 walker
    FileType.opendap: "native",  # engine-internal pure-Python DAP2 client
    FileType.grib: "native",  # engine-internal pure-Python GRIB2 reader
    FileType.zarr: "zarr",
    FileType.npz: "npz",
    FileType.kerchunk: "kerchunk",
}


def open_url(
    fname: str,
    cache: Optional[CacheFSSpecTarget] = None,
    secrets: Optional[dict] = None,
    open_kwargs: Optional[dict] = None,
) -> str:
    """Resolve a source url to a readable location, optionally via the byte
    cache (reference ``openers.py:16-37``). Returns the resolved path: the
    cache path on cache hit/fill, else the (secret-augmented) original."""
    if cache is not None:
        cache.cache_file(fname, secrets, **(open_kwargs or {}))
        return cache.cache_path(fname)
    if secrets:
        return _add_query_string_secrets(fname, secrets)
    return fname


def _local_path(url: str) -> str:
    return url[len("file://"):] if url.startswith("file://") else url


def _is_http(url: str) -> bool:
    return url.startswith(("http://", "https://"))


def _is_remote(url: str) -> bool:
    """Urls read over the network in place: http(s), s3/gs, or azure."""
    return _is_http(url) or url.startswith(
        ("s3://", "gs://", "abfs://", "abfss://", "az://")
    )


def _materialize_local(
    url: str, file_type: FileType, open_kwargs: Optional[dict] = None
) -> tuple:
    """Resolve a url to a local path for path-based readers. ``http(s)://``
    streams to a NamedTemporaryFile (the un-cached open path — recipes
    that open the same file repeatedly should pass ``cache=`` so the
    byte cache pays the transfer once); so do ``s3://`` objects.
    Returns ``(path, is_temp)``."""
    if not _is_remote(url):
        return _local_path(url), False
    from .storage import _open_url_raw

    suffix = f".{file_type.value}" if file_type != FileType.unknown else ""
    tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
    try:
        with _open_url_raw(url, None, **(open_kwargs or {})) as src:
            while True:
                block = src.read(16 * 1024 * 1024)
                if not block:
                    break
                tmp.write(block)
    finally:
        tmp.close()
    return tmp.name, True


def _grib_filter(kw: dict) -> Optional[dict]:
    """GRIB message filter from opener kwargs — accepts the cfgrib
    convention (``backend_kwargs={'filter_by_keys': ...}``) and the flat
    form (reference pushes this into the reader at ``openers.py:191-199``
    via ``kerchunk_open_kwargs``)."""
    return kw.get("filter_by_keys") or kw.get("backend_kwargs", {}).get(
        "filter_by_keys"
    ) or kw.get("filter")


_HDF5_SIG = b"\x89HDF\r\n\x1a\n"


def sniff_file_type(url: str) -> FileType:
    """Detect a source's :class:`FileType` from its bytes — the engine
    analog of the reference's ``FileType.unknown`` auto-selection
    (``openers.py:53-60`` warns and lets xarray's backend guess; here
    the magic numbers decide):

    * zarr: a DIRECTORY (or url prefix) holding ``zarr.json`` /
      ``.zgroup``;
    * HDF5/netCDF4: the 8-byte HDF5 signature at offset 0 or any
      userblock offset 512·2^k;
    * classic netCDF3: ``CDF\\x01/\\x02/\\x05``;
    * GRIB2: ``GRIB``; npz: zip ``PK\\x03\\x04``;
    * kerchunk: a JSON document (leading ``{``).
    """
    if _is_remote(url):
        from .storage import url_range_get
        from .zarrio import _store_for

        store = _store_for(url)
        if store.exists("zarr.json") or store.exists(".zgroup"):
            return FileType.zarr
        head = url_range_get(url, 0, 8)
    else:
        path = _local_path(url)
        if os.path.isdir(path):
            if os.path.exists(os.path.join(path, "zarr.json")) or os.path.exists(
                os.path.join(path, ".zgroup")
            ):
                return FileType.zarr
            raise ValueError(f"{url}: directory without zarr metadata")
        with open(path, "rb") as f:
            head = f.read(8)
    if head[:8] == _HDF5_SIG:
        return FileType.netcdf4
    if head[:3] == b"CDF" and head[3:4] in (b"\x01", b"\x02", b"\x05"):
        return FileType.netcdf3
    if head[:4] == b"GRIB":
        return FileType.grib
    if head[:4] == b"PK\x03\x04":
        return FileType.npz
    if head[:1] in (b"{", b" ", b"\n"):
        return FileType.kerchunk
    # HDF5 userblock: the signature may sit at 512 * 2^k
    def _read_at(off: int, n: int) -> bytes:
        if _is_remote(url):
            from .storage import url_range_get

            try:
                return url_range_get(url, off, n)
            except Exception:
                return b""
        with open(_local_path(url), "rb") as f:
            f.seek(off)
            return f.read(n)

    off = 512
    while off <= (1 << 22):
        sig = _read_at(off, 8)
        if sig == _HDF5_SIG:
            return FileType.netcdf4
        if len(sig) < 8:
            break
        off *= 2
    raise ValueError(
        f"{url}: unrecognized format (first bytes {head[:8]!r}); pass an "
        "explicit file_type"
    )


def _resolve_type(url: str, file_type: FileType) -> FileType:
    return sniff_file_type(url) if file_type == FileType.unknown else file_type


def open_with_ndset(
    url: str,
    file_type: FileType = FileType.npz,
    load: bool = True,
    copy_to_local: bool = False,
    xarray_open_kwargs: Optional[dict] = None,
) -> NDDataset:
    """Open one source file as an NDDataset (reference ``open_with_xarray``,
    ``openers.py:207-254``). ``load=True`` materializes data before the
    fragment crosses an exchange — mandatory in Spark, where a fragment must
    be fully serializable (the reference documents the same hazard at
    ``openers.py:248-252``).

    ``http(s)://`` urls stream to a local temp file first (one GET per
    open — pass ``cache=`` upstream so the byte cache pays the transfer
    once per url); the temp is removed once the open is eager. Remote
    zarr DIRECTORIES are not single files — read them through kerchunk
    references (whose chunk gets range-GET the source) or a cache."""
    file_type = _resolve_type(url, file_type)
    kw = dict(xarray_open_kwargs or {})
    if file_type == FileType.opendap:
        from .dap4io import open_dap

        # opendap is remote-by-definition: no cache/copy_to_local step
        # (reference skips fsspec for it too, ``openers.py:230``).
        # projection + isel push column/row pruning to the server: only
        # the subset crosses the wire. Protocol auto-negotiates (one
        # .dmr probe per process): DAP4 where served, DAP2 fallback —
        # pass protocol="dap2"/"dap4" to pin
        return open_dap(
            url,
            projection=kw.get("projection"),
            isel=kw.get("isel"),
            protocol=kw.get("protocol", "auto"),
            checksums=kw.get("checksums", False),
        )
    if _is_remote(url) and file_type == FileType.zarr:
        # a zarr store over http/s3 is a url PREFIX, not a single file:
        # read it in place through HTTPStore (consolidated metadata =
        # one GET for the group walk; lazy opens range-GET chunks)
        return open_zarr_group(url, load=load)
    if _is_remote(url) and file_type == FileType.netcdf4:
        # HDF5 reads in place too: the header walk runs over
        # block-cached Range GETs and chunk data range-reads through
        # the virtual store — no download
        from .hdf5io import read_hdf5

        return read_hdf5(url)
    path, is_temp = _materialize_local(url, file_type, kw)
    if copy_to_local and not is_temp:
        suffix = f".{file_type.value}" if file_type != FileType.unknown else ""
        tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
        with open(path, "rb") as src:
            tmp.write(src.read())
        tmp.close()
        path = tmp.name
    # formats without a load= knob decode eagerly — their temp download
    # can always be removed after the open; npz/zarr/kerchunk keep the
    # temp alive when load=False leaves lazy byte-ranges into it
    eager = load or file_type in (
        FileType.netcdf3, FileType.netcdf4, FileType.grib
    )
    try:
        if file_type == FileType.npz:
            return read_npz(path, load=load)
        if file_type == FileType.zarr:
            return open_zarr_group(path, load=load)
        if file_type == FileType.netcdf3:
            from .netcdf3 import read_netcdf3

            return read_netcdf3(path)
        if file_type == FileType.netcdf4:
            from .hdf5io import read_hdf5

            return read_hdf5(path)
        if file_type == FileType.grib:
            from .grib2io import read_grib2

            return read_grib2(path, filter_by_keys=_grib_filter(kw))
        if file_type == FileType.kerchunk:
            from .kerchunkio import open_reference_dataset

            return open_reference_dataset(path, load=load)
    finally:
        if is_temp and eager:
            try:
                os.unlink(path)
            except OSError:
                pass
    engine = OPEN_ENGINES.get(file_type)
    raise NotImplementedError(
        f"file_type={file_type.value!r} needs the {engine!r} engine, which is "
        "not installed in this environment. Natively supported: npz, zarr, "
        "kerchunk."
    )


def read_schema(
    url: str,
    file_type: FileType = FileType.npz,
    xarray_open_kwargs: Optional[dict] = None,
) -> XarraySchema:
    """Metadata-only schema of one source file — the cheap first pass of the
    pipeline (the Spark rendition of the reference's lazy ``load=False``
    open at ``transforms.py:230``: here we never touch array payloads).
    Reader options that change the visible dataset (e.g. the GRIB message
    filter) apply to the schema too.

    Over ``http(s)://`` the whole file streams to a temp first (pass
    ``cache=`` upstream so the schema pass and the open pass share one
    transfer); opendap stays header-only over the wire either way."""
    file_type = _resolve_type(url, file_type)
    if _is_remote(url) and file_type not in (
        FileType.opendap, FileType.zarr, FileType.netcdf4
    ):
        # (zarr urls pass through: zarr_group_schema walks the remote
        # store's consolidated metadata in place — one GET; netcdf4
        # passes through: the HDF5 header walk range-reads in place)
        path, _ = _materialize_local(url, file_type, xarray_open_kwargs)
        try:
            return read_schema(
                f"file://{path}", file_type, xarray_open_kwargs
            )
        finally:
            try:
                os.unlink(path)
            except OSError:
                pass
    path = _local_path(url)
    if file_type == FileType.npz:
        return npz_schema(path)
    if file_type == FileType.zarr:
        return zarr_group_schema(path)
    if file_type == FileType.netcdf3:
        from .netcdf3 import netcdf3_schema

        return netcdf3_schema(path)
    if file_type == FileType.netcdf4:
        from .hdf5io import hdf5_schema

        return hdf5_schema(path)
    if file_type == FileType.grib:
        from .grib2io import grib2_schema

        return grib2_schema(
            path, filter_by_keys=_grib_filter(xarray_open_kwargs or {})
        )
    if file_type == FileType.opendap:
        from .dap4io import dap_schema

        return dap_schema(
            url, protocol=(xarray_open_kwargs or {}).get("protocol", "auto")
        )
    # fall back to a full open for formats without a metadata fast path
    return _full_schema(url, file_type, xarray_open_kwargs)


def _full_schema(
    url: str, file_type: FileType, xarray_open_kwargs: Optional[dict] = None
) -> XarraySchema:
    from .aggregation import dataset_to_schema

    return dataset_to_schema(
        open_with_ndset(url, file_type, xarray_open_kwargs=xarray_open_kwargs)
    )


def open_with_kerchunk(
    url: str,
    file_type: FileType = FileType.npz,
    inline_threshold: int = 300,
    storage_options: Optional[dict] = None,
    remote_protocol: Optional[str] = None,
    kerchunk_open_kwargs: Optional[dict] = None,
) -> list:
    """Scan one file into kerchunk-style reference dicts (reference
    ``openers.py:137-204``). Natively scans the engine's npz container
    (byte-range references into the zip), zarr stores (references to the
    chunk objects), classic netcdf3 (contiguous-variable byte ranges,
    analog of kerchunk's ``NetCDF3ToZarr``), netcdf4/HDF5 (object-header
    + chunk-B-tree walk, analog of kerchunk's ``SingleHdf5ToZarr``) and
    grib2 (whole-message chunks via the ``grib2-msg`` codec, analog of
    kerchunk's ``scan_grib``; ``kerchunk_open_kwargs['filter_by_keys']``
    pushes the message filter into the scan).

    ``http(s)://`` sources scan from a one-shot temp download, then the
    emitted byte ranges are rewritten to point at the ORIGINAL url — so
    every later chunk read is a Range GET against the remote source
    (never the vanished temp): scan once, range-read forever."""
    if str(url).endswith(".dmrpp"):
        # a DMR++ sidecar IS the scan (NASA EOSDIS convention): parse
        # the byte-range annotations, read ZERO bytes of the archive.
        # Explicit kerchunk_open_kwargs["data_url"] re-points at a
        # mirror; a sidecar without dmrpp:href falls back to the
        # convention that it sits next to its data object
        from .dap4io import MissingDmrppHref, scan_dmrpp
        from .storage import open_binary

        with open_binary(url) as f:
            text = f.read().decode()
        data_url = (kerchunk_open_kwargs or {}).get("data_url")
        try:
            return [scan_dmrpp(text, data_url=data_url)]
        except MissingDmrppHref:
            # only the missing-href case falls back; real scan errors
            # (malformed offsets, out-of-grid positions) propagate
            return [scan_dmrpp(text, data_url=str(url)[: -len(".dmrpp")])]
    file_type = _resolve_type(url, file_type)
    from .kerchunkio import scan_npz, scan_zarr

    if _is_remote(url) and file_type == FileType.netcdf4:
        # HDF5 scans a REMOTE archive in place: the header walk is a
        # handful of block Range GETs and the emitted refs point at the
        # http url already — no download, no rewrite
        from .hdf5io import scan_hdf5

        return [scan_hdf5(url, inline_threshold=inline_threshold)]
    if _is_remote(url) and file_type == FileType.netcdf3:
        # classic netCDF too: one header block + refs at the remote url
        from .netcdf3 import scan_netcdf3

        return [scan_netcdf3(url, inline_threshold=inline_threshold)]
    if _is_remote(url) and file_type == FileType.grib:
        # GRIB2 scans skip section-7 payloads via seek, so a remote scan
        # transfers O(headers + bitmaps) — the NOMADS/HRRR kerchunk shape
        from .grib2io import scan_grib2

        return [
            scan_grib2(
                url,
                inline_threshold=inline_threshold,
                filter_by_keys=_grib_filter(kerchunk_open_kwargs or {}),
            )
        ]
    if _is_http(url) and file_type == FileType.zarr:
        # scanning needs a key LISTING, which http cannot provide (and a
        # remote zarr store already reads in place through HTTPStore) —
        # fail with the story instead of a confusing 404 on the dir url
        raise NotImplementedError(
            "kerchunk-scanning a REMOTE zarr store is not supported (http "
            "has no key listing) — read it directly: open_zarr_group(url) "
            "/ spark.read.format('zarr').load(url), or scan the store "
            "where it was written"
        )
    if url.startswith(("s3://", "gs://", "abfs://", "abfss://", "az://")) and file_type == FileType.zarr:
        # s3 CAN list keys — scan the store in place: metadata objects
        # inline, chunk objects reference the s3 url whole-object
        from .kerchunkio import scan_zarr_store
        from .zarrio import _store_for

        return [
            scan_zarr_store(
                _store_for(url), url, inline_threshold=inline_threshold
            )
        ]
    if _is_remote(url):
        path, _ = _materialize_local(url, file_type, kerchunk_open_kwargs)
        try:
            refs_list = open_with_kerchunk(
                f"file://{path}",
                file_type,
                inline_threshold=inline_threshold,
                storage_options=storage_options,
                remote_protocol=remote_protocol,
                kerchunk_open_kwargs=kerchunk_open_kwargs,
            )
        finally:
            try:
                os.unlink(path)
            except OSError:
                pass
        temp_url = f"file://{os.path.abspath(path)}"
        for refs in refs_list:
            table = refs.get("refs", refs)
            for key, val in table.items():
                if isinstance(val, list) and val and val[0] == temp_url:
                    table[key] = [url] + val[1:]
        return refs_list

    path = _local_path(url)
    if file_type == FileType.npz:
        return [scan_npz(path, inline_threshold=inline_threshold)]
    if file_type == FileType.zarr:
        return [scan_zarr(path, inline_threshold=inline_threshold)]
    if file_type == FileType.netcdf3:
        from .netcdf3 import scan_netcdf3

        return [scan_netcdf3(path, inline_threshold=inline_threshold)]
    if file_type == FileType.netcdf4:
        from .hdf5io import scan_hdf5

        return [scan_hdf5(path, inline_threshold=inline_threshold)]
    if file_type == FileType.grib:
        from .grib2io import scan_grib2

        return [
            scan_grib2(
                path,
                inline_threshold=inline_threshold,
                filter_by_keys=_grib_filter(kerchunk_open_kwargs or {}),
            )
        ]
    raise NotImplementedError(
        f"kerchunk scanning of file_type={file_type.value!r} is not "
        "supported; supported here: npz, zarr, netcdf3, netcdf4, grib"
    )
