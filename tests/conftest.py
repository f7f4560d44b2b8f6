from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pangeo_forge_recipes_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    yield spark
