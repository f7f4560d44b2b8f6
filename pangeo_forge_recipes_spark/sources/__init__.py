"""Spark data sources for the engine's storage formats."""

from .zarr_source import ZarrDataSource, register_zarr_source

__all__ = ["ZarrDataSource", "register_zarr_source"]
