"""Cloud-native multiscale pipeline: bake a feedstock recipe to an S3
endpoint, then write a pyramid of it — the full deployment story in one
script (runner + object store + StoreToPyramid analog).

Run: PYTHONPATH=/root/repo python examples/cloud_pyramid.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
from data_generation import make_ds
from fake_s3 import FakeS3

from pangeo_forge_recipes_spark import runner, store_to_pyramid
from pangeo_forge_recipes_spark.dsio import write_npz
from pangeo_forge_recipes_spark.ndset import assert_equal
from pangeo_forge_recipes_spark.s3io import configure_spark_s3
from pangeo_forge_recipes_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    srv = FakeS3()  # stands in for a real S3/MinIO/GCS-interop endpoint
    try:
        configure_spark_s3(spark, **srv.client_kwargs())
        work = tempfile.mkdtemp(prefix="cloud_pyr_")

        # archive: four 2-step files along time
        ds = make_ds(nt=8)
        for i in range(4):
            write_npz(
                os.path.join(work, f"f{i}.npz"),
                ds.isel(time=slice(2 * i, 2 * i + 2)),
            )

        # a feedstock: meta.yaml + one declarative recipe module
        feed = os.path.join(work, "feedstock")
        os.makedirs(feed)
        with open(os.path.join(feed, "recipe.py"), "w") as f:
            f.write(textwrap.dedent(f"""
                from pangeo_forge_recipes_spark import pattern_from_file_sequence
                from pangeo_forge_recipes_spark.runner import Recipe

                paths = [r"{work}/f" + str(i) + ".npz" for i in range(4)]
                pattern = pattern_from_file_sequence(
                    paths, "time", nitems_per_file=2, file_type="npz"
                )
                recipe = Recipe(pattern=pattern, store_name="cloud.zarr",
                                target_chunks={{"time": 4}})
            """))
        with open(os.path.join(feed, "meta.yaml"), "w") as f:
            f.write('recipes:\n  - id: "cloud"\n    object: "recipe:recipe"\n')
        with open(os.path.join(work, "config.json"), "w") as f:
            json.dump({"TargetStorage": {"root_path": "s3://demo/target"}}, f)

        # bake: deploy-time injection points the recipe at the s3 target
        result = runner.bake(
            feed, config=os.path.join(work, "config.json"), recipe_id="cloud",
            spark=spark,
        )
        assert result.path == "s3://demo/target/cloud.zarr"
        assert_equal(result.open(), ds)

        # pyramid of the same archive, also on s3
        from pangeo_forge_recipes_spark import pattern_from_file_sequence

        pattern = pattern_from_file_sequence(
            [os.path.join(work, f"f{i}.npz") for i in range(4)],
            "time", nitems_per_file=2, file_type="npz",
        )
        pyr = store_to_pyramid(
            spark, pattern, "s3://demo/pyr", "multi.zarr", levels=2,
        )
        l1 = pyr.open(1)
        assert l1.sizes["lat"] == ds.sizes["lat"] // 2
        want = ds["foo"].data.reshape(
            8, ds.sizes["lat"] // 2, 2, ds.sizes["lon"] // 2, 2
        ).mean(axis=(2, 4))
        np.testing.assert_allclose(l1["foo"].data, want)
        n_objects = len(srv.objects)
        print(f"cloud_pyramid OK: baked + 2-level pyramid on s3 "
              f"({n_objects} objects)")
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
