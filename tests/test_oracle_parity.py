"""Every queries() entry with an oracle must match DuckDB on the fixture data.

This is a local replica of the driver's correctness gate, so failures are
caught before the round's verify runs.
"""

from __future__ import annotations

import pytest

from mapreduce_simple_go_spark.operators import all_oracles, all_queries

from .conftest import SF_DIR, assert_matches_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name])


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)
