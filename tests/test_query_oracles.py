"""The driver's correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly (row count + schema + values)."""

from __future__ import annotations

import pytest

import terrakit_spark.operators  # noqa: F401
from terrakit_spark.registry import ORACLES, QUERIES
from tests.util import assert_match


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_match(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
