"""Tabular → tensor bridge: aggregate an event stream into a dense
(day × event-type) grid, persist it as a Zarr v3 store, and query the
store back through the ``zarr`` DataFrame relation.

The composition an analytics-to-science handoff runs:

1. A Spark SQL aggregation produces the long-form grid (one row per
   grid point) from the raw events parquet.
2. ``dataframe_to_zarr`` materializes it as a chunked Zarr store in one
   chunk-grain shuffle — the driver holds only the dimension axes;
   absent cells take fill_value 0.
3. ``spark.read.format("zarr")`` serves the store back as a DataFrame
   with chunk-grain partition pruning on dim-coordinate predicates —
   the downstream reader never touches chunks its filter excludes.

Run: PYTHONPATH=/root/repo python examples/events_to_zarr.py
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.dsio import open_zarr_group
from pangeo_forge_recipes_spark.session import get_spark
from pangeo_forge_recipes_spark.sources import dataframe_to_zarr, read_zarr

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    events.createOrReplaceTempView("events")

    grid = spark.sql(
        """
        SELECT CAST(datediff(CAST(ts AS DATE), DATE'2024-01-01') AS BIGINT) AS day,
               CAST(CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
                    WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                    WHEN 'view' THEN 4 ELSE 5 END AS BIGINT) AS etype,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(round(sum(value), 4) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
        """
    )
    tmp = tempfile.mkdtemp(prefix="events_zarr_")
    path = dataframe_to_zarr(
        grid, tmp, "events_grid.zarr", dims=["day", "etype"],
        target_chunks={"day": 8, "etype": 3}, fill_value=0,
    )

    # the store is a normal NDDataset for the science side...
    ds = open_zarr_group(path)
    n_days = ds.sizes["day"]
    assert ds.sizes["etype"] >= 1
    total = int(ds.data_vars["n_events"].data.sum())
    assert total == events.count(), (total, events.count())

    # ...and a pruned DataFrame scan for the analytics side: a filter on
    # the day coordinate prunes whole chunk slabs at planning time.
    # read_zarr = a FRESH relation per query (see its docstring for the
    # upstream scan-cache hazard on reused loaded DataFrames)
    full_parts = read_zarr(spark, path).rdd.getNumPartitions()
    recent = read_zarr(spark, path).filter(F.col("day") >= n_days - 8)
    n_parts = (
        recent.withColumn("pid", F.spark_partition_id())
        .select("pid").distinct().count()
    )
    assert n_parts < full_parts, (n_parts, full_parts)
    recent_total = recent.agg(F.sum("n_events")).collect()[0][0]
    print(
        f"events_to_zarr OK: {total} events over {n_days} days; "
        f"last-8-day scan pruned to {n_parts}/{full_parts} chunk slabs, "
        f"{recent_total} events"
    )
    spark.stop()


if __name__ == "__main__":
    main()
