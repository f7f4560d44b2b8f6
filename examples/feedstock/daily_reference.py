"""Feedstock recipe: the same archive -> a kerchunk-style virtual Zarr
reference file (the reference's ``WriteCombinedReference`` branch)."""

from _archive import ensure_archive

from pangeo_forge_recipes_spark import pattern_from_file_sequence
from pangeo_forge_recipes_spark.runner import Recipe

pattern = pattern_from_file_sequence(
    ensure_archive(), "time", nitems_per_file=1, file_type="npz"
)
recipe = Recipe(pattern=pattern, store_name="daily_refs", kind="reference")
