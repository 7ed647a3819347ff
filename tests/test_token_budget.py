"""Two-pass token-budget plan: exact parity with the one-pass global
window, and a doc-level window that is PARTITIONED (no global sort over
the documents table — round-3 verdict item 4)."""

from __future__ import annotations

from terrakit_spark.operators.textops import _token_budget_onepass, _token_budget_twopass


def _rows(spark, sql):
    df = spark.sql(sql)
    return sorted(tuple(r) for r in df.collect()), df


def test_twopass_matches_onepass_exactly(synth, spark, sf_dir):
    one, _ = _rows(spark, _token_budget_onepass("spark"))
    two, _ = _rows(spark, _token_budget_twopass("spark"))
    assert one == two and len(one) > 0


def test_twopass_doc_window_is_partitioned(synth, spark, sf_dir):
    _, df = _rows(spark, _token_budget_twopass("spark"))
    # AQE prints Final + Initial plans; judge only the final one
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # the doc-level running sum shuffles by bucket, not to one partition
    assert "hashpartitioning(bkt" in plan
    # the only SinglePartition exchange feeds the tiny histogram prefix sum
    assert plan.count("Exchange SinglePartition") <= 1
    # and the one-pass plan's global doc sort signature is absent: every
    # Window over (priority, doc_id) must carry a bkt partition spec
    for frag in plan.split("Window [")[1:]:
        head = frag[:200]
        if "priority" in head and "doc_id" in head:
            assert "bkt" in head, head
