"""Deterministic scale-up generator: stack K id-shifted copies of a driver
testdata dir to synthesize a larger scale factor (default: 10x sf0.1 -> an
sf1-equivalent under .work/sf1). No randomness — copy k shifts fact-table
ids by k*SHIFT so every derived synth relation (labels/scenes/media from
events, docs_aug from documents) scales linearly with the same modular
distributions; dimension tables are copied verbatim.

Usage: python scripts/gen_sf.py [--base /root/testdata/sf0.1] [--out .work/sf1] [--k 10]

Copy-k document text gets a ' c<k>' suffix so the corpus does not become a
pile of exact 10-way duplicates (which would make the dedup benches
unrepresentatively heavy); embeddings keep their vectors (ANN cost is a
function of N, not of vector values), and the IVF codebook predicate
(vec_id < 29*1024) keeps its fixed size because shifted ids exceed it.
"""

from __future__ import annotations

import argparse
import os

import duckdb

SHIFT = 10_000_000
USER_SHIFT = 1_000_000

COPIES = {
    "events": (
        "SELECT event_id + {k} * {shift} AS event_id, ts, user_id + {k} * {ushift} AS user_id, "
        "event_type, value, props FROM base"
    ),
    "documents": (
        "SELECT doc_id + {k} * {shift} AS doc_id, "
        "CASE WHEN {k} = 0 THEN text ELSE text || ' c{k}' END AS text, "
        "lang, source, n_chars FROM base"
    ),
    "embeddings": "SELECT vec_id + {k} * {shift} AS vec_id, embedding, label FROM base",
    "lineitem": (
        "SELECT l_orderkey + {k} * {shift} AS l_orderkey, l_partkey, l_suppkey, l_linenumber, "
        "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM base"
    ),
    "orders": (
        "SELECT o_orderkey + {k} * {shift} AS o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority FROM base"
    ),
}
VERBATIM = ["region", "nation", "customer", "supplier", "part"]


def generate(base: str, out: str, k_copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, tpl in COPIES.items():
        con.execute(f"CREATE OR REPLACE VIEW base AS SELECT * FROM read_parquet('{base}/{t}.parquet')")
        parts = [tpl.format(k=k, shift=SHIFT, ushift=USER_SHIFT) for k in range(k_copies)]
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    for t in VERBATIM:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{base}/{t}.parquet')) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/root/testdata/sf0.1")
    p.add_argument("--out", default=".work/sf1")
    p.add_argument("--k", type=int, default=10)
    a = p.parse_args()
    generate(a.base, a.out, a.k)
