"""Native Azure Blob client/store vs the in-process fake endpoint
(SharedKey verified by recomputation server-side)."""

from __future__ import annotations

import pickle

import pytest

from pangeo_forge_recipes_spark import azureio, s3io
from pangeo_forge_recipes_spark.azureio import (
    AzureClient,
    AzureConfig,
    AzureError,
    AzureStore,
    parse_azure_url,
)

from .fake_azure import ACCOUNT, ACCOUNT_KEY, FakeAzure


@pytest.fixture(scope="module")
def az(request):
    srv = FakeAzure()
    request.addfinalizer(srv.stop)
    return srv


@pytest.fixture()
def store(az):
    az.objects.clear()
    az.blocks.clear()
    az.requests.clear()
    return AzureStore("az://cont/some/prefix", **az.client_kwargs())


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


def test_get_range_and_suffix(store):
    store.put("r.bin", bytes(range(100)))
    assert store.get_range("r.bin", 10, 5) == bytes(range(10, 15))
    assert store.get_range("r.bin", -7, 0) == bytes(range(93, 100))
    assert store.get_range("r.bin", 95, 50) == bytes(range(95, 100))


def test_list_prefix_paginates(az, store):
    for i in range(7):
        store.put(f"d/k{i:02d}", b"x")
    store.put("other/k", b"y")
    import pangeo_forge_recipes_spark.azureio as azm

    old = azm._LIST_PAGE
    azm._LIST_PAGE = 3  # force the marker loop
    try:
        keys = sorted(store.list_prefix("d"))
    finally:
        azm._LIST_PAGE = old
    assert keys == [f"d/k{i:02d}" for i in range(7)]
    pages = [
        q for m, c, k, q in az.requests if m == "GET" and q.get("comp") == "list"
    ]
    assert sum(1 for q in pages if "marker" in q) >= 2


def test_list_prefix_with_sizes_no_heads(az, store):
    store.put("z/zarr.json", b"{}")
    store.put("z/c/0", bytes(700))
    az.requests.clear()
    pairs = dict(store.list_prefix_with_sizes("z"))
    assert pairs == {"z/zarr.json": 2, "z/c/0": 700}
    assert all(m != "HEAD" for m, _, _, _ in az.requests)


def test_block_upload_via_put_parts(monkeypatch, az, store):
    monkeypatch.setattr(s3io, "MULTIPART_PART_BYTES", 1024)
    payload = bytes(i % 251 for i in range(5000))
    parts = [payload[i : i + 700] for i in range(0, len(payload), 700)]
    store.put_parts("big.bin", parts)
    assert store.get("big.bin") == payload
    methods = [(m, q) for m, _, k, q in az.requests if k.endswith("big.bin")]
    assert sum(1 for m, q in methods if q.get("comp") == "block") >= 4
    assert any(q.get("comp") == "blocklist" for m, q in methods)
    # committed blocks leave the uncommitted set
    assert not any(k[1].endswith("big.bin") for k in az.blocks)
    # small objects stay single-PUT
    store.put_parts("small.bin", [b"ab", b"cd"])
    assert store.get("small.bin") == b"abcd"
    small = [
        q
        for m, _, k, q in az.requests
        if k.endswith("small.bin") and m == "PUT"
    ]
    assert all("comp" not in q for q in small)


def test_write_buffer_and_abort(monkeypatch, az, store):
    monkeypatch.setattr(s3io, "MULTIPART_PART_BYTES", 512)
    payload = bytes(i % 241 for i in range(2000))
    buf = s3io.S3WriteBuffer(store, "stream.bin")
    for i in range(0, len(payload), 300):
        buf.write(payload[i : i + 300])
    buf.close()
    assert store.get("stream.bin") == payload
    # abort on exception: nothing committed
    with pytest.raises(RuntimeError):
        with s3io.S3WriteBuffer(store, "partial.bin") as b2:
            b2.write(bytes(1500))
            raise RuntimeError("dead source")
    assert not store.exists("partial.bin")


def test_bad_key_rejected(az):
    bad = AzureStore(
        "az://cont",
        account_name=ACCOUNT,
        account_key="d2VyeWJhZGtleQ==",
        endpoint_url=az.endpoint,
    )
    with pytest.raises(AzureError) as ei:
        bad.put("x", b"1")
    assert ei.value.status == 403


def test_retry_on_injected_throttle(az, store):
    az.fail_queue.extend([503])
    store.put("retry.bin", b"ok")  # retried transparently
    assert store.get("retry.bin") == b"ok"


def test_store_pickles_without_live_client(store):
    store.put("p.bin", b"1")
    st2 = pickle.loads(pickle.dumps(store))
    assert st2.get("p.bin") == b"1"


def test_azure_error_pickles_faithfully():
    e = AzureError(403, "AuthenticationFailed", "sig mismatch", "k")
    e2 = pickle.loads(pickle.dumps(e))
    assert (e2.status, e2.code, e2.message, e2.key) == (
        403,
        "AuthenticationFailed",
        "sig mismatch",
        "k",
    )


def test_parse_azure_url():
    assert parse_azure_url("az://cont/a/b") == (None, "cont", "a/b")
    assert parse_azure_url("abfs://cont/a") == (None, "cont", "a")
    assert parse_azure_url(
        "abfs://cont@acct.dfs.core.windows.net/a/b"
    ) == ("acct", "cont", "a/b")
    assert parse_azure_url(
        "abfss://cont@acct.blob.core.windows.net/"
    ) == ("acct", "cont", "")
    with pytest.raises(ValueError):
        parse_azure_url("s3://bucket/k")


def test_config_resolution(monkeypatch, az):
    for var in (
        "AZURE_STORAGE_CONNECTION_STRING",
        "AZURE_STORAGE_ACCOUNT_NAME",
        "AZURE_STORAGE_ACCOUNT",
        "AZURE_STORAGE_ACCOUNT_KEY",
        "AZURE_STORAGE_KEY",
        "AZURE_STORAGE_SAS_TOKEN",
        "AZURE_STORAGE_BLOB_ENDPOINT",
    ):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(ValueError, match="account missing"):
        AzureConfig()
    monkeypatch.setenv("AZURE_STORAGE_ACCOUNT_NAME", ACCOUNT)
    with pytest.raises(ValueError, match="credentials missing"):
        AzureConfig()
    monkeypatch.setenv("AZURE_STORAGE_ACCOUNT_KEY", ACCOUNT_KEY)
    cfg = AzureConfig()
    assert cfg.account_name == ACCOUNT
    assert cfg.endpoint_url.endswith(".blob.core.windows.net")
    # connection string (the Azurite convention) wins over defaults and
    # carries the custom endpoint
    monkeypatch.setenv(
        "AZURE_STORAGE_CONNECTION_STRING",
        f"AccountName={ACCOUNT};AccountKey={ACCOUNT_KEY};"
        f"BlobEndpoint={az.endpoint}",
    )
    cfg2 = AzureConfig()
    assert cfg2.endpoint_url == az.endpoint
    # env-resolved client round-trips against the fake endpoint
    cl = AzureClient()
    cl.put_object("envcont", "k", b"v")
    assert cl.get_object("envcont", "k") == b"v"


def test_sas_token_auth_verified(az):
    """A service SAS generated by the engine authenticates against the
    VERIFYING fake server (signature recomputed server-side from the
    public string-to-sign), and the sp permission letters are
    enforced per method."""
    from pangeo_forge_recipes_spark.azureio import generate_service_sas

    sas_rw = generate_service_sas(
        "sascont",
        permissions="rwl",
        expiry="2036-01-01T00:00:00Z",
        account_name=ACCOUNT,
        account_key=ACCOUNT_KEY,
    )
    cl = AzureClient(
        account_name=ACCOUNT, sas_token=sas_rw, endpoint_url=az.endpoint
    )
    cl.put_object("sascont", "k.bin", b"sas")
    assert cl.get_object("sascont", "k.bin") == b"sas"
    assert dict(cl.list_objects("sascont", "")) == {"k.bin": 3}
    # read-only SAS: GET works, PUT rejected with a permission error
    sas_r = generate_service_sas(
        "sascont",
        permissions="r",
        expiry="2036-01-01T00:00:00Z",
        account_name=ACCOUNT,
        account_key=ACCOUNT_KEY,
    )
    ro = AzureClient(
        account_name=ACCOUNT, sas_token=sas_r, endpoint_url=az.endpoint
    )
    assert ro.get_object("sascont", "k.bin") == b"sas"
    with pytest.raises(AzureError) as ei:
        ro.put_object("sascont", "x.bin", b"1")
    assert ei.value.status == 403
    # a tampered signature is rejected outright
    bad = AzureClient(
        account_name=ACCOUNT,
        sas_token=sas_r.replace("sig=", "sig=AAAA"),
        endpoint_url=az.endpoint,
    )
    with pytest.raises(AzureError):
        bad.get_object("sascont", "k.bin")


def test_escaped_key_shared_key_signature(az, store):
    """Blob keys needing percent-encoding (space, unicode, '+', '#')
    round-trip through the VERIFYING server: SharedKey canonicalizes
    the percent-ENCODED wire path (the official SDK signs
    ``urlparse(url).path`` as sent), so signing the decoded form would
    403 here — the r10 advice finding."""
    for key in ("dir/a b/c.bin", "u/ünïcøde.bin", "p/x+y#z.bin"):
        store.put(key, b"payload-" + key.encode())
        assert store.get(key) == b"payload-" + key.encode()
        assert store.exists(key)
        assert store.size(key) == len(b"payload-" + key.encode())
    # the listing surfaces the decoded names
    names = {k for k, _ in store.client.list_objects("cont", "some/prefix/")}
    assert any("a b" in n for n in names)
    store.rm_prefix("")


def test_sas_connection_string_ignores_env_account_key(monkeypatch, az):
    """A connection string carrying ONLY SharedAccessSignature resolves
    atomically: a stale AZURE_STORAGE_ACCOUNT_KEY in the environment
    must not leak into account_key and flip the auth scheme to a
    wrong-context SharedKey (the r10 advice finding)."""
    from pangeo_forge_recipes_spark.azureio import generate_service_sas

    sas = generate_service_sas(
        "csco",
        permissions="rwl",
        expiry="2036-01-01T00:00:00Z",
        account_name=ACCOUNT,
        account_key=ACCOUNT_KEY,
    )
    monkeypatch.setenv("AZURE_STORAGE_ACCOUNT_KEY", "c3RhbGUta2V5LXdyb25nLWNvbnRleHQ=")
    monkeypatch.setenv(
        "AZURE_STORAGE_CONNECTION_STRING",
        f"AccountName={ACCOUNT};SharedAccessSignature={sas};"
        f"BlobEndpoint={az.endpoint}",
    )
    cfg = AzureConfig()
    assert cfg.account_key is None
    assert cfg.sas_token == sas
    cl = AzureClient(cfg)
    cl.put_object("csco", "k.bin", b"v")
    assert cl.get_object("csco", "k.bin") == b"v"
    # env keys still resolve when the connection string has no credential
    monkeypatch.setenv(
        "AZURE_STORAGE_CONNECTION_STRING",
        f"AccountName={ACCOUNT};BlobEndpoint={az.endpoint}",
    )
    cfg2 = AzureConfig()
    assert cfg2.account_key == "c3RhbGUta2V5LXdyb25nLWNvbnRleHQ="
