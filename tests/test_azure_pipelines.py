"""End-to-end pipelines against the fake Azure Blob endpoint — the
``abfs://``/``az://`` twin of ``test_s3_pipelines.py`` (the reference
reaches Azure through fsspec/adlfs, reference ``storage.py:16,85-86``;
this engine speaks the Blob REST API natively). SharedKey signatures
are verified by recomputation server-side on every request."""

from __future__ import annotations

import json
import os

import pytest

from pangeo_forge_recipes_spark import (
    assert_equal,
    pattern_from_file_sequence,
    store_to_zarr,
    write_combined_reference,
)
from pangeo_forge_recipes_spark.azureio import (
    AzureStore,
    configure_spark_azure,
)
from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset
from pangeo_forge_recipes_spark.storage import CacheFSSpecTarget, FSSpecTarget

from .data_generation import make_ds, split_ds_into_files
from .fake_azure import FakeAzure


@pytest.fixture(scope="module")
def az(request, spark):
    srv = FakeAzure()
    configure_spark_azure(spark, **srv.client_kwargs())
    request.addfinalizer(srv.stop)
    return srv


def test_store_to_zarr_on_azure(spark, tmp_path, az):
    """The flagship round-trip with the TARGET on Azure Blob: executors
    region-write chunk objects straight to blobs via SharedKey."""
    ds = make_ds(nt=6)
    paths = split_ds_into_files(ds, str(tmp_path), items_per_file=2)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="npz"
    )
    result = store_to_zarr(
        spark, pattern, "az://pipelines/targets", "store.zarr",
        target_chunks={"time": 3},
    )
    assert result.path.startswith("az://pipelines/targets")
    assert_equal(result.open(), ds)
    keys = {k for (c, k) in az.objects if c == "pipelines"}
    assert "targets/store.zarr/zarr.json" in keys
    assert any("/c/" in k for k in keys)


def test_store_to_zarr_azure_sources(spark, tmp_path, az):
    """Sources ALSO on Azure: the opener pulls input bytes from blobs
    (``az://`` urls in the FilePattern) while writing locally."""
    ds = make_ds(nt=4)
    local = split_ds_into_files(ds, str(tmp_path), items_per_file=2)
    store = AzureStore("az://sources", **az.client_kwargs())
    urls = []
    for p in local:
        with open(p, "rb") as f:
            store.put(os.path.basename(p), f.read())
        urls.append(f"az://sources/{os.path.basename(p)}")
    pattern = pattern_from_file_sequence(
        urls, "time", nitems_per_file=2, file_type="npz"
    )
    result = store_to_zarr(
        spark, pattern, str(tmp_path / "t"), "from_az.zarr",
        target_chunks={"time": 2},
    )
    assert_equal(result.open(), ds)


def test_input_cache_on_azure(spark, tmp_path, az):
    """CacheFSSpecTarget with an azure root: first call uploads, second
    call size-skips (no second PUT of the object)."""
    src = tmp_path / "src.bin"
    src.write_bytes(b"x" * 1000)
    cache = CacheFSSpecTarget.from_url("az://cachecont/cache")
    cache.fsspec_kwargs.update(az.client_kwargs())
    cache.cache_file(str(src), None)
    assert cache.exists(str(src))
    assert cache.size(str(src)) == 1000
    puts_before = sum(
        1 for m, c, k, q in az.requests if m == "PUT" and c == "cachecont"
    )
    cache.cache_file(str(src), None)  # size matches — skip
    puts_after = sum(
        1 for m, c, k, q in az.requests if m == "PUT" and c == "cachecont"
    )
    assert puts_after == puts_before
    # cached object is readable through the generic url opener
    from pangeo_forge_recipes_spark.storage import open_binary

    url = "az://cachecont/cache/" + cache._rel(str(src))
    with open_binary(url, **az.client_kwargs()) as f:
        assert f.read() == b"x" * 1000


def test_kerchunk_reference_on_azure(spark, tmp_path, az):
    """write_combined_reference with the reference FILE on azure and
    chunk refs pointing at azure SOURCE blobs — fully-cloud virtual
    store, reads served by ranged GETs."""
    from pangeo_forge_recipes_spark.netcdf3 import write_netcdf3

    ds = make_ds(nt=4)
    store = AzureStore("az://refsrc", **az.client_kwargs())
    urls = []
    for i, start in enumerate(range(0, 4, 2)):
        p = str(tmp_path / f"nc_{i}.nc")
        write_netcdf3(p, ds.isel(time=slice(start, start + 2)))
        with open(p, "rb") as f:
            store.put(os.path.basename(p), f.read())
        urls.append(f"az://refsrc/{os.path.basename(p)}")
    pattern = pattern_from_file_sequence(
        urls, "time", nitems_per_file=2, file_type="netcdf3"
    )
    refpath = write_combined_reference(
        spark, pattern, "az://refout/here", "ref"
    )
    assert refpath.startswith("az://refout/here")
    back = open_reference_dataset(refpath)
    assert_equal(back, ds)
    raw = json.loads(
        AzureStore("az://refout", **az.client_kwargs()).get(
            "here/ref/reference.json"
        )
    )
    chunk_refs = [v for v in raw["refs"].values() if isinstance(v, list)]
    assert chunk_refs and all(
        v[0].startswith("az://refsrc/") for v in chunk_refs
    )


def test_tfrecord_shards_on_azure(spark, az):
    """TFRecord shard write → list → read entirely on Azure Blob."""
    from pangeo_forge_recipes_spark.sources import tfrecord as tfr

    df = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(40)], "doc_id long, text string"
    )
    out = "az://shards/tfr"
    manifest = tfr.write_tfrecord_shards(df, out, n_shards=4).collect()
    assert len(manifest) == 4
    back = tfr.read_tfrecord(
        spark, out, {"doc_id": "int64", "text": "string"}
    )
    rows = back.collect()
    assert {r["doc_id"] for r in rows} == set(range(40))
    assert {r["shard"] for r in rows} == {
        f"shards/tfr/shard-{i:05d}.tfrecord" for i in range(4)
    }


def test_azure_glob_shard_selection(spark, az):
    """Single-level glob over blobs: az://cont/dir/*.tfrecord must not
    descend into dir/sub/."""
    from pangeo_forge_recipes_spark.storage import list_shard_urls

    store = AzureStore("az://globc", **az.client_kwargs())
    store.put("d/a.tfrecord", b"1")
    store.put("d/b.tfrecord", b"2")
    store.put("d/skip.txt", b"3")
    store.put("d/sub/c.tfrecord", b"4")
    urls = list_shard_urls(
        "az://globc/d/*.tfrecord", (".tfrecord",),
        open_kwargs=az.client_kwargs(),
    )
    assert [u.rsplit("/", 1)[-1] for u in urls] == ["a.tfrecord", "b.tfrecord"]


def test_fsspec_target_surface_on_azure(az):
    t = FSSpecTarget.from_url("az://tgt/root")
    t.fsspec_kwargs.update(az.client_kwargs())
    assert t.get_fsspec_remote_protocol() == "abfs"
    with t.open("sub/obj.bin", mode="wb") as f:
        f.write(b"abc")
    assert t.exists("sub/obj.bin") and t.size("sub/obj.bin") == 3
    with t.open("sub/obj.bin") as f:
        assert f.read() == b"abc"
    t.makedir("whatever")  # object stores: no-op, must not raise
    (t / "sub").rm("obj.bin")
    assert not t.exists("sub/obj.bin")
    # recursive rm sweeps a prefix but not its sibling
    with t.open("a/x", mode="wb") as f:
        f.write(b"1")
    with t.open("ab/y", mode="wb") as f:
        f.write(b"2")
    t.rm("a", recursive=True)
    assert not t.exists("a/x") and t.exists("ab/y")


def test_abfs_full_form_url(az):
    """The adlfs full form abfs://container@account.host/key routes the
    account from the url authority; endpoint still honors the client
    kwargs (custom emulator endpoint)."""
    from tests.fake_azure import ACCOUNT

    kw = dict(az.client_kwargs())
    kw.pop("account_name")
    store = AzureStore(
        f"abfs://full@{ACCOUNT}.dfs.core.windows.net/pre", **kw
    )
    store.put("k.bin", b"xyz")
    assert store.get("k.bin") == b"xyz"
    assert ("full", "pre/k.bin") in az.objects


def test_verify_zarr_on_azure(spark, tmp_path, az):
    """The distributed integrity scrub against an az:// store url."""
    from pangeo_forge_recipes_spark.dsio import verify_zarr

    ds = make_ds(nt=4)
    paths = split_ds_into_files(ds, str(tmp_path), items_per_file=2)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="npz"
    )
    result = store_to_zarr(
        spark, pattern, "az://verifycont/t", "v.zarr",
        target_chunks={"time": 2},
    )
    report = verify_zarr(spark, result.path).collect()
    assert report and all(r["ok"] for r in report)
    assert any(r["exists"] for r in report)


def test_store_to_pyramid_on_azure(spark, tmp_path, az):
    """Multiscale pyramid entirely on Azure Blob: level 0 through the
    pipeline, level 1 a distributed coarsen of the level-0 blobs."""
    import numpy as np

    from pangeo_forge_recipes_spark.pyramid import store_to_pyramid

    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable
    from pangeo_forge_recipes_spark.dsio import write_npz

    nt, nlat, nlon = 2, 4, 6
    foo = (
        1000.0 * np.arange(nt)[:, None, None]
        + 10 * np.arange(nlat)[None, :, None]
        + np.arange(nlon)[None, None, :]
    )
    ds = NDDataset(
        {"foo": Variable(("time", "lat", "lon"), foo)},
        {
            "time": Variable(("time",), np.arange(nt, dtype="int64")),
            "lat": Variable(("lat",), np.arange(nlat, dtype="float64")),
            "lon": Variable(("lon",), np.arange(nlon, dtype="float64")),
        },
    )
    p = str(tmp_path / "pyr_src.npz")
    write_npz(p, ds)
    pattern = pattern_from_file_sequence(
        [p], "time", nitems_per_file=nt, file_type="npz"
    )
    result = store_to_pyramid(
        spark, pattern, "az://pyrcont/t", "p.zarr", levels=2,
        target_chunks={"time": 2, "lat": 2, "lon": 2},
    )
    l1 = result.open(1)
    want = (
        1000.0 * np.arange(nt)[:, None, None]
        + 10 * (2 * np.arange(2) + 0.5)[None, :, None]
        + (2 * np.arange(3) + 0.5)[None, None, :]
    )
    np.testing.assert_allclose(l1["foo"].data, want)
    keys = {k for (c, k) in az.objects if c == "pyrcont"}
    assert "t/p.zarr/zarr.json" in keys  # multiscales root doc on azure


def test_sharded_and_v2_stores_on_azure(spark, tmp_path, az):
    """Two write layouts through Azure Blob: zarr v3 sharding_indexed
    (whole shards stream via put_parts -> Put Block when large) and
    the classic v2 layout — both must round-trip."""
    ds = make_ds(nt=8)
    paths = split_ds_into_files(ds, str(tmp_path), items_per_file=4)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=4, file_type="npz"
    )
    sharded = store_to_zarr(
        spark, pattern, "az://layouts/a", "sharded.zarr",
        target_chunks={"time": 2}, target_shards={"time": 4},
    )
    assert_equal(sharded.open(), ds)
    keys = {k for (c, k) in az.objects if c == "layouts"}
    assert any("sharded.zarr/foo/c/" in k for k in keys)
    v2 = store_to_zarr(
        spark, pattern, "az://layouts/b", "classic.zarr",
        target_chunks={"time": 4}, zarr_format=2,
    )
    assert_equal(v2.open(), ds)
    assert ("layouts", "b/classic.zarr/.zgroup") in az.objects


def test_stream_append_to_azure_store(spark, tmp_path, az):
    """Micro-batch append with the TARGET on Azure Blob: batch 1
    bootstraps, batch 2 appends along time; the existence probe
    dispatches on scheme, and an explicit local checkpoint is
    demanded for object-store targets."""
    from pangeo_forge_recipes_spark.dsio import open_zarr_group, write_npz
    from pangeo_forge_recipes_spark.streaming.append import (
        stream_append_to_zarr,
    )

    ds = make_ds(nt=4)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    manifest_dir = str(tmp_path / "manifests")
    os.makedirs(manifest_dir)
    ckpt = str(tmp_path / "ckpt")

    with pytest.raises(ValueError, match="checkpoint_dir"):
        stream_append_to_zarr(
            spark, manifest_dir, "az://streamcont/t", "s.zarr", "time",
            {"time": 2},
        )

    def run_batch(batch_idx, file_idx):
        lines = "".join(f"{2 * i},{paths[i]}\n" for i in file_idx)
        with open(os.path.join(manifest_dir, f"b{batch_idx}.txt"), "w") as f:
            f.write(lines)
        q = stream_append_to_zarr(
            spark, manifest_dir, "az://streamcont/t", "s.zarr", "time",
            {"time": 2}, checkpoint_dir=ckpt,
        )
        q.awaitTermination()

    run_batch(0, [0])
    run_batch(1, [1])
    rt = open_zarr_group("az://streamcont/t/s.zarr")
    assert rt.sizes["time"] == 4
    assert_equal(rt, ds, check_attrs=False)


def test_bake_feedstock_to_azure(spark, az):
    """The deployment runner with an az:// target root — config
    injection + credentials from the exported connection string."""
    import os as _os

    from pangeo_forge_recipes_spark.runner import bake

    fs = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "examples",
        "feedstock",
    )
    config = {
        "TargetStorage": {"root_path": "az://bakery/target"},
        "InputCacheStorage": {"root_path": "az://bakery/cache"},
    }
    result = bake(
        fs, config=config, recipe_id="daily-zarr", prune=True, spark=spark
    )
    assert result.path == "az://bakery/target/daily.zarr"
    ds = result.open()
    assert ds.sizes["time"] == 2
    assert any(k.startswith("cache/") for (c, k) in az.objects if c == "bakery")


def test_store_to_zarr_with_sas_only_credentials(spark, tmp_path, az):
    """Executors authenticate every request with a container-scoped
    service SAS — no account key ever reaches the workers (the
    share-a-token deployment mode). The fake endpoint verifies the SAS
    signature and permissions on each request."""
    from pangeo_forge_recipes_spark.azureio import generate_service_sas

    from .fake_azure import ACCOUNT, ACCOUNT_KEY

    sas = generate_service_sas(
        "sasonly",
        permissions="rwcld",
        expiry="2036-01-01T00:00:00Z",
        account_name=ACCOUNT,
        account_key=ACCOUNT_KEY,
    )
    try:
        configure_spark_azure(
            spark,
            account_name=ACCOUNT,
            sas_token=sas,
            endpoint_url=az.endpoint,
        )
        ds = make_ds(nt=4)
        paths = split_ds_into_files(ds, str(tmp_path), items_per_file=2)
        pattern = pattern_from_file_sequence(
            paths, "time", nitems_per_file=2, file_type="npz"
        )
        result = store_to_zarr(
            spark, pattern, "az://sasonly/t", "s.zarr",
            target_chunks={"time": 2},
        )
        assert_equal(result.open(), ds)
        # the writes really rode SAS (sig in query, no Authorization)
        puts = [
            q for m, c, k, q in az.requests
            if m == "PUT" and c == "sasonly"
        ]
        assert puts and all("sig" in q for q in puts)
    finally:
        # restore the key-based session credentials for later tests
        configure_spark_azure(spark, **az.client_kwargs())
