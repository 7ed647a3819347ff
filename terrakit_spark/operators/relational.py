"""General relational capability demos over the TPC-H-ish testdata (the
engine's glue operators: filter/project/agg/join/window/sort/limit used by
every pipeline above). Identical SQL text in both dialects."""

from __future__ import annotations

from terrakit_spark.registry import register_sql


def _pricing_summary(dialect: str) -> str:
    # TPC-H Q1 shape
    return """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _top_orders(dialect: str) -> str:
    # TPC-H Q3 shape with deterministic tie-breaking. Top-10 is expressed
    # as ORDER BY ... LIMIT (Spark: TakeOrderedAndProject — per-partition
    # heaps merged on the driver), NOT row_number() over an unpartitioned
    # window: a global ranking window collapses every aggregated row into
    # ONE partition before ranking — the round-4 perf_weak item. Ordering
    # uses the UNROUNDED revenue (what the window version ranked by) so
    # ties that round to the same cent keep the identical winner set.
    from terrakit_spark.dialect import D

    d = D(dialect)
    odate = d.date_str("CAST(o.o_orderdate AS DATE)")
    return f"""
SELECT o_orderkey, revenue, o_orderdate_str FROM (
  SELECT o.o_orderkey,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS _rev_exact,
         {odate} AS o_orderdate_str
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
  GROUP BY o.o_orderkey, {odate}
  ORDER BY _rev_exact DESC, o.o_orderkey ASC
  LIMIT 10
) t
"""


def _region_rollup(dialect: str) -> str:
    # multi-join star rollup
    return """
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(c.c_acctbal), 2) AS sum_acctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name, n.n_name
"""


register_sql("pricing_summary", _pricing_summary, tables=[])
register_sql("top_orders_window", _top_orders, tables=[])
register_sql("region_rollup", _region_rollup, tables=[])


def _sessionize_events(dialect: str) -> str:
    """§2.9 sessionization as a driver-checked query: classic
    gaps-and-islands (30-minute inactivity gap) over the events feed — the
    batch twin of streaming/incremental.py::sessionize_stream, same shape
    both dialects."""
    return """
SELECT min(ts) AS session_start, user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM (
    SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          + INTERVAL 30 MINUTE
                   THEN 1 ELSE 0 END AS is_new
    FROM events) _m) _s
GROUP BY user_id, session_id
"""


register_sql("sessionize_events", _sessionize_events, tables=[])
