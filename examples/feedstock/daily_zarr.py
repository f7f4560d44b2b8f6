"""Feedstock recipe: the 4-day archive -> one chunked Zarr store (the
reference's ``examples/feedstock/*.py`` + ``meta.yaml`` deployment
convention; bake with ``runner.bake(..., recipe_id="daily-zarr")``)."""

from _archive import ensure_archive

from pangeo_forge_recipes_spark import pattern_from_file_sequence
from pangeo_forge_recipes_spark.runner import Recipe

pattern = pattern_from_file_sequence(
    ensure_archive(), "time", nitems_per_file=1, file_type="npz"
)
recipe = Recipe(
    pattern=pattern,
    store_name="daily.zarr",
    target_chunks={"time": 2},
)
