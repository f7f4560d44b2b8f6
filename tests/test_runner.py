"""The bake runner: feedstock resolution, config parsing, injections,
prune, both recipe kinds, callable recipes, and the CLI face
(reference ``docs/deployment/cli.md`` + ``injections.py``)."""

from __future__ import annotations

import json
import os
import textwrap

import pytest

from pangeo_forge_recipes_spark import runner
from pangeo_forge_recipes_spark.dsio import open_zarr_group, write_npz
from pangeo_forge_recipes_spark.ndset import assert_equal

from .data_generation import make_ds


@pytest.fixture()
def feedstock(tmp_path):
    """A feedstock dir with two recipes (zarr + kerchunk) over a 4-file
    npz archive, plus a JSON and a traitlets-style Python config."""
    ds = make_ds(nt=4)
    arch = tmp_path / "archive"
    arch.mkdir()
    for i in range(4):
        write_npz(str(arch / f"f{i}.npz"), ds.isel(time=slice(i, i + 1)))
    fs = tmp_path / "feedstock"
    fs.mkdir()
    (fs / "recipe_zarr.py").write_text(textwrap.dedent(f"""
        from pangeo_forge_recipes_spark import pattern_from_file_sequence
        from pangeo_forge_recipes_spark.runner import Recipe

        paths = [r"{arch}/f" + str(i) + ".npz" for i in range(4)]
        pattern = pattern_from_file_sequence(
            paths, "time", nitems_per_file=1, file_type="npz"
        )
        recipe = Recipe(
            pattern=pattern, store_name="out.zarr",
            target_chunks={{"time": 2}},
        )
    """))
    (fs / "recipe_refs.py").write_text(textwrap.dedent(f"""
        from pangeo_forge_recipes_spark import pattern_from_file_sequence
        from pangeo_forge_recipes_spark.runner import Recipe

        paths = [r"{arch}/f" + str(i) + ".npz" for i in range(4)]
        pattern = pattern_from_file_sequence(
            paths, "time", nitems_per_file=1, file_type="npz"
        )
        recipe = Recipe(pattern=pattern, store_name="refs", kind="reference")
    """))
    (fs / "recipe_callable.py").write_text(textwrap.dedent("""
        def recipe(spark, ctx):
            return {"target": ctx.target_root, "prune": ctx.prune,
                    "job": ctx.job_name}
    """))
    (fs / "meta.yaml").write_text(textwrap.dedent("""
        recipes:
          - id: "to-zarr"
            object: "recipe_zarr:recipe"
          - id: "to-refs"
            object: "recipe_refs:recipe"
          - id: "custom"
            object: "recipe_callable:recipe"
    """))
    (tmp_path / "config.json").write_text(json.dumps(
        {"TargetStorage": {"root_path": str(tmp_path / "target")},
         "InputCacheStorage": {"root_path": str(tmp_path / "cache")}}
    ))
    (tmp_path / "config.py").write_text(textwrap.dedent(f"""
        c.Bake.bakery_class = "ignored.LocalDirectBakery"
        c.TargetStorage.fsspec_class = "ignored.LocalFileSystem"
        c.TargetStorage.root_path = r"{tmp_path / 'target_py'}"
        c.InputCacheStorage.root_path = r"{tmp_path / 'cache_py'}"
    """))
    return tmp_path, fs, ds


def test_meta_and_config_parsing(feedstock):
    tmp, fs, _ = feedstock
    entries = runner.parse_meta(str(fs))
    assert [e["id"] for e in entries] == ["to-zarr", "to-refs", "custom"]
    cfg = runner.load_config(str(tmp / "config.json"))
    assert cfg["target_root"].endswith("target")
    assert cfg["cache_root"].endswith("cache")
    # python config via the c. traitlets convention; unknown sections ignored
    cfg_py = runner.load_config(str(tmp / "config.py"))
    assert cfg_py["target_root"].endswith("target_py")
    assert cfg_py["cache_root"].endswith("cache_py")
    with pytest.raises(ValueError, match="pass recipe_id"):
        runner.load_recipe(str(fs))
    with pytest.raises(KeyError, match="nope"):
        runner.load_recipe(str(fs), "nope")


def test_bake_zarr_with_injection(spark, feedstock):
    tmp, fs, ds = feedstock
    result = runner.bake(
        str(fs), config=str(tmp / "config.json"), recipe_id="to-zarr",
        spark=spark,
    )
    assert result.path == str(tmp / "target" / "out.zarr")
    assert_equal(result.open(), ds)


def test_bake_reference_and_prune(spark, feedstock):
    tmp, fs, ds = feedstock
    refpath = runner.bake(
        str(fs), config=str(tmp / "config.json"), recipe_id="to-refs",
        spark=spark,
    )
    from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset

    assert_equal(open_reference_dataset(refpath), ds)
    # --prune keeps the first 2 concat keys (the CLI test-deploy tip)
    pruned = runner.bake(
        str(fs), config={"target_root": str(tmp / "pruned")},
        recipe_id="to-zarr", prune=True, spark=spark,
    )
    assert open_zarr_group(pruned.path).sizes["time"] == 2


def test_bake_callable_recipe_gets_context(spark, feedstock):
    tmp, fs, _ = feedstock
    out = runner.bake(
        str(fs), config=str(tmp / "config.json"), recipe_id="custom",
        prune=3, job_name="j9", spark=spark,
    )
    assert out["target"].endswith("target")
    assert out["prune"] == 3 and out["job"] == "j9"


def test_bake_requires_target(spark, feedstock):
    _, fs, _ = feedstock
    with pytest.raises(ValueError, match="target storage"):
        runner.bake(str(fs), recipe_id="to-zarr", spark=spark)


def test_cli_bake(spark, feedstock, capsys):
    tmp, fs, ds = feedstock
    rc = runner.main([
        "bake", "--repo", str(fs), "-f", str(tmp / "config.json"),
        "--Bake.recipe_id=to-zarr", "--Bake.job_name=cli-job", "--prune",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "baked:" in out and "out.zarr" in out
    assert open_zarr_group(str(tmp / "target" / "out.zarr")).sizes["time"] == 2


def test_config_py_section_reaccess_accumulates(tmp_path):
    """Re-accessing a c. section must return the SAME node — assigning
    fsspec_args after root_path must not drop root_path (ADVICE r9:
    __getattr__ used to replace the section per access)."""
    cfg = tmp_path / "config.py"
    cfg.write_text(
        'c.TargetStorage.root_path = "/data/target"\n'
        'c.TargetStorage.fsspec_class = "ignored.LocalFileSystem"\n'
        'c.TargetStorage.fsspec_args = {"auto_mkdir": True}\n'
        'c.InputCacheStorage.root_path = "/data/cache"\n'
        'c.InputCacheStorage.fsspec_class = "ignored.LocalFileSystem"\n'
    )
    out = runner.load_config(str(cfg))
    assert out["target_root"] == "/data/target"
    assert out["cache_root"] == "/data/cache"
