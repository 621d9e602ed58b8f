"""Every oracle-checked ``queries()`` entry, replayed in pytest at sf0.001:
Spark result must match the DuckDB oracle on row count, column names, and
order-insensitive canonical values — the same comparison the driver's
correctness gate applies at sf0.01 (see check_oracle.py)."""

import duckdb
import pytest

from check_oracle import TABLES, _rows_key
from ccdb_data_pipeline_spark.benchqueries import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLE[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _rows_key(scols, srows) == _rows_key(ocols, orows)
