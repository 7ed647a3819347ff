"""The synthetic derivations must be bit-identical between the Spark engine
and the DuckDB oracle — this is the foundation every oracle check rests on."""

from __future__ import annotations

import pytest

from terrakit_spark.dialect import DUCK, SPARK
from terrakit_spark.synth import ALL_TABLES
from tests.util import assert_match


@pytest.mark.parametrize("name", list(ALL_TABLES))
def test_synth_table_parity(synth, duck, name):
    fn = ALL_TABLES[name]
    sdf = synth.sql(fn(SPARK))
    # dates collapse to strings for comparison; drop raw date cols
    drop = [c for c, t in sdf.dtypes if t == "date"]
    sdf = sdf.drop(*drop)
    duck_sql = f"SELECT * EXCLUDE ({', '.join(drop)}) FROM ({fn(DUCK)}) _q" if drop else fn(DUCK)
    assert_match(sdf, duck, duck_sql)


def test_spans_offsets_strictly_increasing(synth):
    bad = synth.sql(
        """
        SELECT doc_id FROM (
          SELECT doc_id, offset, count(*) OVER (PARTITION BY doc_id, offset) AS c
          FROM spans
        ) WHERE c > 1
        """
    ).count()
    assert bad == 0


def test_media_refs_resolve(synth):
    orphan = synth.sql(
        """
        SELECT s.media_ref FROM spans s LEFT ANTI JOIN media m ON s.media_ref = m.media_ref
        WHERE s.kind = 'media'
        """
    ).count()
    assert orphan == 0
