"""Differential test: every registered query vs its DuckDB oracle.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json) so a
green run here predicts a green driver run.
"""

from __future__ import annotations

import pytest

from tinyerp_etl_spark.plans.registry import all_oracles, all_queries
from tinyerp_etl_spark.testing import assert_matches_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir, name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
