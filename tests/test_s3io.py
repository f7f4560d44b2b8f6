"""Native S3 client/store vs the in-process fake S3 endpoint (SigV4
verified by recomputation server-side)."""

from __future__ import annotations

import pickle

import pytest

from pangeo_forge_recipes_spark import s3io
from pangeo_forge_recipes_spark.s3io import S3Client, S3Error, S3Store

from .fake_s3 import FakeS3


@pytest.fixture(scope="module")
def s3(request):
    srv = FakeS3()
    request.addfinalizer(srv.stop)
    return srv


@pytest.fixture()
def store(s3):
    s3.objects.clear()
    s3.requests.clear()
    return S3Store("s3://bkt/some/prefix", **s3.client_kwargs())


def test_put_get_head_delete_roundtrip(store):
    store.put("a/b.bin", b"hello")
    assert store.get("a/b.bin") == b"hello"
    assert store.exists("a/b.bin")
    assert store.size("a/b.bin") == 5
    store.rm_prefix("a")
    assert not store.exists("a/b.bin")
    with pytest.raises(KeyError):
        store.get("a/b.bin")
    with pytest.raises(KeyError):
        store.size("a/b.bin")


def test_key_prefix_mapping(s3, store):
    store.put("x.bin", b"1")
    assert ("bkt", "some/prefix/x.bin") in s3.objects


def test_get_range_and_suffix(store):
    store.put("r.bin", bytes(range(100)))
    assert store.get_range("r.bin", 10, 5) == bytes(range(10, 15))
    assert store.get_range("r.bin", -7, 0) == bytes(range(93, 100))
    # range past EOF clamps like S3 does
    assert store.get_range("r.bin", 95, 50) == bytes(range(95, 100))


def test_list_prefix_paginates(s3, store):
    for i in range(7):
        store.put(f"d/k{i:02d}", b"x")
    store.put("other/k", b"y")
    # force pagination through the real continuation-token loop
    got = list(
        store.client.list_objects("bkt", "some/prefix/d/", page_size=3)
    )
    assert [k for k, _ in got] == [f"some/prefix/d/k{i:02d}" for i in range(7)]
    assert list(store.list_prefix("d")) == [f"d/k{i:02d}" for i in range(7)]


def test_multipart_put_parts(monkeypatch, s3, store):
    monkeypatch.setattr(s3io, "MULTIPART_PART_BYTES", 1024)
    payload = bytes(i % 251 for i in range(5000))
    parts = [payload[i : i + 700] for i in range(0, len(payload), 700)]
    store.put_parts("big.bin", parts)
    assert store.get("big.bin") == payload
    # it actually went multipart: the server saw uploads + completion
    methods = [(m, q) for m, _, k, q in s3.requests if k.endswith("big.bin")]
    assert any("uploads" in q for m, q in methods if m == "POST")
    assert sum(1 for m, q in methods if m == "PUT" and "partNumber" in q) >= 4
    # small objects stay single-PUT
    store.put_parts("small.bin", [b"ab", b"cd"])
    assert store.get("small.bin") == b"abcd"
    small = [
        (m, q)
        for m, _, k, q in s3.requests
        if k.endswith("small.bin") and m == "PUT"
    ]
    assert all("partNumber" not in q for _, q in small)


def test_write_buffer_streams_parts(monkeypatch, s3, store):
    monkeypatch.setattr(s3io, "MULTIPART_PART_BYTES", 512)
    buf = s3io.S3WriteBuffer(store, "stream.bin")
    payload = bytes(i % 241 for i in range(2000))
    for i in range(0, len(payload), 300):
        buf.write(payload[i : i + 300])
    buf.close()
    assert store.get("stream.bin") == payload
    # empty object via the buffer
    b2 = s3io.S3WriteBuffer(store, "empty.bin")
    b2.close()
    assert store.get("empty.bin") == b"" and store.exists("empty.bin")


def test_bad_signature_rejected(s3):
    kwargs = dict(s3.client_kwargs())
    kwargs["secret_key"] = "wrong"
    client = S3Client(**kwargs)
    with pytest.raises(S3Error) as ei:
        client.put_object("bkt", "k", b"v")
    assert ei.value.status == 403
    assert ei.value.code == "SignatureDoesNotMatch"
    kwargs["secret_key"] = s3.client_kwargs()["secret_key"]
    kwargs["access_key"] = "unknown"
    with pytest.raises(S3Error) as ei:
        S3Client(**kwargs).put_object("bkt", "k", b"v")
    assert ei.value.status == 403


def test_signs_range_header_and_special_keys(s3, store):
    # keys with spaces / unicode / '+' must sign and roundtrip (uri
    # encoding is part of the canonical request)
    key = "weird dir/ünï+code (1).bin"
    store.put(key, b"payload")
    assert store.get(key) == b"payload"
    assert store.get_range(key, 2, 3) == b"ylo"


def test_retry_on_injected_throttle(s3, store):
    store.put("retry.bin", b"v")
    s3.fail_queue.extend([503, 500])
    assert store.get("retry.bin") == b"v"  # two retries then success


def test_store_pickles_without_live_client(store):
    store.put("p.bin", b"q")
    clone = pickle.loads(pickle.dumps(store))
    assert clone._client is None  # rebuilt lazily on the "executor"
    assert clone.get("p.bin") == b"q"


def test_missing_credentials_raise(monkeypatch):
    for var in (
        "AWS_ACCESS_KEY_ID",
        "AWS_SECRET_ACCESS_KEY",
        "AWS_SESSION_TOKEN",
        "AWS_ENDPOINT_URL_S3",
        "AWS_ENDPOINT_URL",
    ):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(ValueError, match="AWS_ACCESS_KEY_ID"):
        S3Client()


def test_env_credentials_resolve(monkeypatch, s3):
    kw = s3.client_kwargs()
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", kw["access_key"])
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", kw["secret_key"])
    monkeypatch.setenv("AWS_ENDPOINT_URL_S3", kw["endpoint_url"])
    monkeypatch.setenv("AWS_DEFAULT_REGION", kw["region"])
    client = S3Client()
    assert client.config.path_style  # custom endpoint defaults path-style
    client.put_object("envbkt", "k", b"v")
    assert client.get_object("envbkt", "k") == b"v"


def test_parse_s3_url():
    assert s3io.parse_s3_url("s3://b/k/deep.bin") == ("b", "k/deep.bin")
    assert s3io.parse_s3_url("s3://b") == ("b", "")
    with pytest.raises(ValueError):
        s3io.parse_s3_url("http://b/k")
    with pytest.raises(ValueError):
        s3io.parse_s3_url("s3:///k")


def test_gs_interop_store(s3, monkeypatch):
    """gs:// urls ride the same SigV4 client in GCS interoperability
    mode: GS_* HMAC credentials, path-style endpoint, region 'auto' —
    verified against the signature-recomputing endpoint."""
    kw = s3.client_kwargs()
    monkeypatch.setenv("GS_ACCESS_KEY_ID", kw["access_key"])
    monkeypatch.setenv("GS_SECRET_ACCESS_KEY", kw["secret_key"])
    monkeypatch.setenv("GS_ENDPOINT_URL", kw["endpoint_url"])
    for var in (
        "AWS_ACCESS_KEY_ID",
        "AWS_SECRET_ACCESS_KEY",
        # an ambient OAuth key file must not reroute gs:// away from
        # the HMAC-interop path this test pins (r10 env-leak lesson)
        "GOOGLE_APPLICATION_CREDENTIALS",
    ):
        monkeypatch.delenv(var, raising=False)
    store = S3Store("gs://gsbkt/pre")
    assert store.client.config.service == "gs"
    assert store.client.config.region == "auto"
    store.put("a/b.bin", b"gcs-bytes")
    assert store.get("a/b.bin") == b"gcs-bytes"
    assert store.get_range("a/b.bin", 4, 5) == b"bytes"
    assert list(store.list_prefix("a")) == ["a/b.bin"]
    # generic url opener + range reader dispatch on the gs scheme too
    from pangeo_forge_recipes_spark.storage import (
        open_binary,
        open_range_file,
        url_range_get,
    )

    with open_binary("gs://gsbkt/pre/a/b.bin") as f:
        assert f.read() == b"gcs-bytes"
    assert url_range_get("gs://gsbkt/pre/a/b.bin", 0, 3) == b"gcs"
    rf = open_range_file("gs://gsbkt/pre/a/b.bin")
    assert rf.size == 9 and rf.read(3) == b"gcs"
    # zarr store resolution
    from pangeo_forge_recipes_spark.zarrio import _store_for

    zs = _store_for("gs://gsbkt/z")
    zs.put("zarr.json", b"{}")
    assert zs.exists("zarr.json")


def test_gs_missing_credentials_raise(monkeypatch):
    for var in (
        "GS_ACCESS_KEY_ID",
        "GS_SECRET_ACCESS_KEY",
        "AWS_ACCESS_KEY_ID",
        "AWS_SECRET_ACCESS_KEY",
        "GOOGLE_APPLICATION_CREDENTIALS",
    ):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(ValueError, match="GS_ACCESS_KEY_ID"):
        S3Store("gs://b/k")


def test_keepalive_connection_reuse(s3, store):
    """The transport pools one connection per (scheme, host) per
    thread: a burst of sequential ops reuses a single TCP connection
    (keep-alive), and a poisoned half-read stream tears it down
    instead of corrupting the next request."""
    import threading

    from pangeo_forge_recipes_spark.s3io import _POOL

    pool = getattr(_POOL, "conns", None)
    if pool:
        pool.clear()
    store.put("ka/a.bin", b"x" * 64)
    for i in range(5):
        assert store.get("ka/a.bin") == b"x" * 64
        store.put(f"ka/{i}.bin", b"y")
    pool = _POOL.conns
    assert len(pool) == 1  # one live connection did all of it
    conn = next(iter(pool.values()))
    # half-read a LARGE streaming body, then close early: the poisoned
    # connection must leave the pool; the next op works on a fresh one
    store.put("ka/big.bin", b"z" * (3 << 20))
    stream = store.client.open_object_stream("bkt", "some/prefix/ka/big.bin")
    assert stream.read(10) == b"z" * 10
    stream.close()
    assert next(iter(_POOL.conns.values()), None) is not conn or not _POOL.conns
    assert store.get("ka/a.bin") == b"x" * 64


def test_s3error_pickles_faithfully(s3):
    """Errors raised inside Spark tasks cross the boundary pickled —
    the OSError default reduce loses the subclass fields."""
    import pickle

    from pangeo_forge_recipes_spark.s3io import S3Error

    e = S3Error(404, "NoSuchKey", "missing", "a/b")
    e2 = pickle.loads(pickle.dumps(e))
    assert isinstance(e2, S3Error)
    assert (e2.status, e2.code) == (404, "NoSuchKey")
    assert "NoSuchKey" in str(e2)


def test_write_buffer_aborts_on_exception(monkeypatch, s3, store):
    """Context-manager exit on an exception must abort the multipart
    upload, not commit a truncated object (ADVICE r9)."""
    monkeypatch.setattr(s3io, "MULTIPART_PART_BYTES", 512)
    with pytest.raises(RuntimeError, match="source died"):
        with s3io.S3WriteBuffer(store, "partial.bin") as buf:
            buf.write(bytes(1500))  # two parts already uploaded
            raise RuntimeError("source died")
    assert not store.exists("partial.bin")
    assert s3.uploads == {}  # in-flight upload aborted server-side
    methods = [
        (m, q) for m, _, k, q in s3.requests if k.endswith("partial.bin")
    ]
    assert any(m == "DELETE" and "uploadId" in q for m, q in methods)
    # clean exit still completes
    with s3io.S3WriteBuffer(store, "ok.bin") as buf:
        buf.write(b"fine")
    assert store.get("ok.bin") == b"fine"


def test_list_prefix_with_sizes_no_heads(s3, store):
    """(key, size) pairs come from ONE listing — zero per-key HEADs
    (ADVICE r9: scan_zarr_store was doubling request count)."""
    store.put("z/zarr.json", b"{}")
    store.put("z/c/0", bytes(700))
    s3.requests.clear()
    pairs = dict(store.list_prefix_with_sizes("z"))
    assert pairs == {"z/zarr.json": 2, "z/c/0": 700}
    assert all(m != "HEAD" for m, _, _, _ in s3.requests)
    assert sum(1 for m, _, _, q in s3.requests if m == "GET") == 1


def test_list_shard_urls_glob_single_level(s3, store):
    """'*' in an s3 glob must not cross '/' — matches local glob
    semantics (ADVICE r9)."""
    from pangeo_forge_recipes_spark.storage import list_shard_urls

    store.put("d/a.tfrecord", b"1")
    store.put("d/b.tfrecord", b"2")
    store.put("d/skip.txt", b"3")
    store.put("d/sub/c.tfrecord", b"4")
    urls = list_shard_urls(
        "s3://bkt/some/prefix/d/*.tfrecord",
        (".tfrecord",),
        open_kwargs=s3.client_kwargs(),
    )
    assert [u.rsplit("/", 1)[-1] for u in urls] == ["a.tfrecord", "b.tfrecord"]
    # '?' is also single-level single-char
    urls = list_shard_urls(
        "s3://bkt/some/prefix/d/?.tfrecord",
        (".tfrecord",),
        open_kwargs=s3.client_kwargs(),
    )
    assert [u.rsplit("/", 1)[-1] for u in urls] == ["a.tfrecord", "b.tfrecord"]


def test_list_shard_urls_recursive_doublestar(s3, store):
    """'**' crosses directory levels (rglob semantics), including the
    zero-level case — 's3://b/dir/**/*.tfrecord' matches files directly
    under dir/ AND arbitrarily nested ones (ADVICE r10)."""
    from pangeo_forge_recipes_spark.storage import list_shard_urls

    store.put("e/top.tfrecord", b"1")
    store.put("e/sub/mid.tfrecord", b"2")
    store.put("e/sub/deep/leaf.tfrecord", b"3")
    store.put("e/sub/skip.txt", b"4")
    urls = list_shard_urls(
        "s3://bkt/some/prefix/e/**/*.tfrecord",
        (".tfrecord",),
        open_kwargs=s3.client_kwargs(),
    )
    assert sorted(u.rsplit("/", 1)[-1] for u in urls) == [
        "leaf.tfrecord",
        "mid.tfrecord",
        "top.tfrecord",
    ]
    # trailing '**' sweeps everything under the prefix
    urls = list_shard_urls(
        "s3://bkt/some/prefix/e/sub/**",
        (".tfrecord", ".txt"),
        open_kwargs=s3.client_kwargs(),
    )
    assert sorted(u.rsplit("/", 1)[-1] for u in urls) == [
        "leaf.tfrecord",
        "mid.tfrecord",
        "skip.txt",
    ]


def test_presigned_url_roundtrip(s3, store):
    """SigV4 query-string presigning (r11): the holder needs no
    credentials — a plain HTTP GET through the generic url opener
    fetches the object; the fake endpoint RECOMPUTES the presign
    signature (host-only signed headers, UNSIGNED-PAYLOAD) and enforces
    expiry; tampering or the wrong method fails."""
    from pangeo_forge_recipes_spark.s3io import generate_presigned_url
    from pangeo_forge_recipes_spark.storage import open_binary

    store.put("shared/obj.bin", b"presigned-payload")
    url = generate_presigned_url(
        "s3://bkt/some/prefix/shared/obj.bin", **s3.client_kwargs()
    )
    assert url.startswith("http") and "X-Amz-Signature=" in url
    with open_binary(url) as f:  # no credentials involved
        assert f.read() == b"presigned-payload"
    # tampered signature rejected
    import urllib.error
    import urllib.request

    bad = url.replace("X-Amz-Signature=", "X-Amz-Signature=0000")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad)
    assert ei.value.code == 403
    # expired url rejected
    old = generate_presigned_url(
        "s3://bkt/some/prefix/shared/obj.bin",
        expires=1,
        **s3.client_kwargs(),
    )
    import time as _time

    _time.sleep(1.2)
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(old)
    assert ei.value.code == 403
    # a GET-signed url cannot PUT (the method is in the canonical req)
    req = urllib.request.Request(url, data=b"overwrite", method="PUT")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 403
    # an explicitly PUT-signed url uploads without credentials
    up = generate_presigned_url(
        "s3://bkt/some/prefix/shared/up.bin",
        method="PUT",
        **s3.client_kwargs(),
    )
    urllib.request.urlopen(
        urllib.request.Request(up, data=b"uploaded", method="PUT")
    )
    assert store.get("shared/up.bin") == b"uploaded"


def test_presigned_url_expiry_cap(s3):
    """expires beyond the 7-day SigV4 cap (or non-positive) refuses at
    generation instead of minting an always-rejected url."""
    from pangeo_forge_recipes_spark.s3io import generate_presigned_url

    with pytest.raises(ValueError, match="604800"):
        generate_presigned_url(
            "s3://bkt/k", expires=8 * 86400, **s3.client_kwargs()
        )
    with pytest.raises(ValueError, match="604800"):
        generate_presigned_url("s3://bkt/k", expires=0, **s3.client_kwargs())
