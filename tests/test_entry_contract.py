"""Driver-contract correctness gate, run locally at sf0.001 for speed.

Mirrors the driver's t2 check: for every key in __spark_entry__.queries()
that also appears in oracle_sql(), run both and compare canonicalized
results.  Keys without an oracle get a rows-only smoke check."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_frames_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spdf = sdf.toPandas()
    if name not in ORACLES:
        assert len(spdf) >= 0  # rows-only check (driver records the weaker gate)
        return
    opdf = oracle.execute(ORACLES[name]).fetchdf()
    assert_frames_match(spdf, opdf, name)
