from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from revtron_utils_spark.session import get_spark

    spark = get_spark(app_name="revtron-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture()
def engine(spark, sf_dir, tmp_path):
    from revtron_utils_spark import Engine

    eng = Engine(spark, warehouse_dir=str(tmp_path / "wh"))
    eng.attach_dir(sf_dir)
    return eng


def duck():
    """DuckDB connection with the fixture tables registered as views —
    mirrors the driver's oracle setup."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    return con
