"""Physical-plan regression tests — the plan we want, not just the first one
that passes (pushdown reaches the parquet scan, small sides broadcast, no
nested-loop joins in the spatial path, codegen on the relational glue)."""

from __future__ import annotations

import terrakit_spark.operators  # noqa: F401
from terrakit_spark.registry import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spatial_join_is_equi_hash(synth, spark, sf_dir):
    # cell equi-join (AQE picks broadcast vs shuffled hash vs SMJ at
    # runtime); never a nested-loop/cartesian theta join
    df = QUERIES["spatial_join_pip"](spark, sf_dir)
    plan = _plan(df)
    assert any(j in plan for j in ("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_parquet_filter_pushdown(synth, spark, sf_dir):
    df = QUERIES["pricing_summary"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_on_events_scan(synth, spark, sf_dir):
    # labels/scenes derive from events: only event_id should be read
    df = QUERIES["grouped_bbox"](spark, sf_dir)
    plan = _plan(df)
    scan = plan.split("ReadSchema")[1][:120]
    assert "event_id" in scan and "props" not in scan and "value" not in scan


def test_relational_glue_is_codegen(synth, spark, sf_dir):
    # "*(n)" prefixes mark whole-stage-codegen spans in the executed plan
    plan = _plan(QUERIES["window_grid"](spark, sf_dir))
    assert "*(1)" in plan


def test_grid_knn_matches_broadcast_knn(synth, spark, sf_dir):
    # the shuffle-path strategy (cell-ring phases + proof bound) must agree
    # exactly with the oracle-checked broadcast strategy
    from terrakit_spark.operators.knn import broadcast_knn, grid_knn

    q = spark.sql("SELECT media_ref AS qid, mx, my FROM media WHERE doc_num % 100 = 0")
    c = spark.sql("SELECT label_id, cx, cy FROM labels")
    a = sorted(tuple(r) for r in grid_knn(q, c).collect())
    b = sorted(tuple(r) for r in broadcast_knn(q, c).collect())
    assert a == b


def test_knn_no_global_cartesian_on_ring_phase(synth, spark, sf_dir):
    # phase-1 ring join must be a hash join on cell ids; the fallback
    # crossJoin only ever sees the unproven-query subset
    df = QUERIES["knn_grid"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
