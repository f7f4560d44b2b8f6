"""Spark data sources for the engine's storage formats."""

from .zarr_source import ZarrDataSource, read_zarr, register_zarr_source
from .zarr_writer import dataframe_to_zarr
from .tfrecord import read_tfrecord, write_tfrecord_shards
from .warc import html_payload_text, read_warc, write_warc
from .webdataset import decode_webdataset_text, read_webdataset

__all__ = [
    "ZarrDataSource",
    "register_zarr_source",
    "read_zarr",
    "dataframe_to_zarr",
    "read_warc",
    "html_payload_text",
    "write_warc",
    "read_webdataset",
    "decode_webdataset_text",
    "read_tfrecord",
    "write_tfrecord_shards",
]
