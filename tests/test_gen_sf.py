"""scripts/gen_sf.py — the deterministic scale-up generator behind the sf1
evidence runs: k id-shifted copies, schema preserved, byte-deterministic."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from gen_sf import SHIFT, generate  # noqa: E402


def _counts(d: str) -> dict:
    con = duckdb.connect()
    out = {}
    for t in ["events", "documents", "embeddings", "lineitem", "orders", "region"]:
        out[t] = con.sql(f"SELECT count(*) FROM read_parquet('{d}/{t}.parquet')").fetchone()[0]
    con.close()
    return out


def test_gen_sf_scales_and_is_deterministic(tmp_path, sf_dir):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    generate(sf_dir, out1, 2)
    generate(sf_dir, out2, 2)

    base, scaled = _counts(sf_dir), _counts(out1)
    for t in ["events", "documents", "embeddings", "lineitem", "orders"]:
        assert scaled[t] == 2 * base[t], t
    assert scaled["region"] == base["region"]  # dims verbatim

    con = duckdb.connect()
    # deterministic: two runs produce identical tables
    for t in ["events", "documents"]:
        n = con.sql(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet('{out1}/{t}.parquet') "
            f"EXCEPT SELECT * FROM read_parquet('{out2}/{t}.parquet'))"
        ).fetchone()[0]
        assert n == 0, t
    # copy-1 ids are shifted, disjoint from copy-0, and modular structure
    # is preserved (shift is a multiple of the small synth mods' lcm-free
    # design: distributions stay statistically identical, ids stay unique)
    dup = con.sql(
        f"SELECT count(*) FROM (SELECT event_id FROM read_parquet('{out1}/events.parquet') "
        f"GROUP BY event_id HAVING count(*) > 1)"
    ).fetchone()[0]
    assert dup == 0
    hi = con.sql(
        f"SELECT count(*) FROM read_parquet('{out1}/events.parquet') WHERE event_id >= {SHIFT}"
    ).fetchone()[0]
    assert hi == base["events"]
    # copy-k text is perturbed so the corpus is not k-way exact duplicates
    same_text = con.sql(
        f"SELECT count(*) FROM read_parquet('{out1}/documents.parquet') a "
        f"JOIN read_parquet('{out1}/documents.parquet') b ON b.doc_id = a.doc_id + {SHIFT} "
        f"WHERE a.text = b.text"
    ).fetchone()[0]
    assert same_text == 0
    con.close()
