"""Incremental ingestion via Structured Streaming.

The reference is purely batch with file-presence resumability (SURVEY §2.9);
the engine adds a streaming ingest path for the events/label feed: file
source -> watermarked windowed aggregation -> sink, with availableNow
triggers so the same code serves both continuous and catch-up/batch runs.
Checkpointing makes restarts exactly-once per epoch, complementing the
snapshot/lineage resume of the batch layer (plans/snapshots.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def windowed_event_counts_stream(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """readStream over a parquet directory -> per-(window, event_type)
    counts with late-data handling."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )


def run_available_now(df: DataFrame, checkpoint: str, query_name: str) -> None:
    """Drain everything currently available into the in-memory sink."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful streaming operator: per-user session windows with a
    30-minute inactivity gap — built on session_window (state-store backed;
    the applyInPandasWithState escape hatch is only needed for logic
    session_window can't express)."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events", "sum_value")
    )


def sessionize_batch(spark: SparkSession, input_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Batch oracle for sessionization: classic gaps-and-islands with a lag
    window — used to verify the streaming result on a static input."""
    src = spark.read.schema(EVENT_SCHEMA).parquet(input_dir)
    src.createOrReplaceTempView("_sess_events")
    return spark.sql(
        f"""
        SELECT min(ts) AS session_start, user_id,
               count(*) AS n_events, round(sum(value), 6) AS sum_value
        FROM (
          SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
          FROM (
            SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                  + INTERVAL {gap_minutes} MINUTES
                           THEN 1 ELSE 0 END AS is_new
            FROM _sess_events) _m) _s
        GROUP BY user_id, session_id
        """
    )


def batch_equivalent(spark: SparkSession, input_dir: str, window: str = "1 hour") -> DataFrame:
    """The same aggregation as a batch job — used to verify the streaming
    result equals the batch result on a static input."""
    src = spark.read.schema(EVENT_SCHEMA).parquet(input_dir)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprint", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

DEDUP_BUCKETS = 256
BLOOM_BITS = 1 << 16  # 65,536 bits/bucket -> 1,024 longs of bounded state
BLOOM_K = 4  # hash probes; FP ~ (1 - e^(-K*n/BITS))^K ~ 1.2e-5 at n=1,000/bucket


def _bloom_coords(fingerprint: str):
    """K (word, mask) probe coordinates via double hashing of two CRC32s —
    deterministic across executors (no PYTHONHASHSEED dependence)."""
    import zlib

    raw = fingerprint.encode()
    h1 = zlib.crc32(raw)
    h2 = zlib.crc32(b"terrakit-bloom:" + raw) | 1
    idx = [((h1 + i * h2) & 0xFFFFFFFF) % BLOOM_BITS for i in range(BLOOM_K)]
    return [(i >> 6, 1 << (i & 63)) for i in idx]


def streaming_first_seen(spark: SparkSession, input_dir: str, state: str = "exact") -> DataFrame:
    """Custom stateful streaming dedup via applyInPandasWithState: emit a
    document only the FIRST time its content fingerprint is seen across the
    whole stream (the training-pipeline 'exact dedup at ingest' shape).

    groupBy(bucket) bounds both shuffle keys and per-group state; within a
    micro-batch the min-doc_id duplicate wins (deterministic), across
    batches the earlier batch wins (stream order).

    state='exact': per-bucket fingerprint set — exact, but state grows
    linearly with distinct fingerprints.
    state='bloom': per-bucket fixed 65,536-bit bloom filter (1,024 longs,
    BOUNDED however many docs stream through — the 10^12-doc shape).
    False-positive contract: a colliding NEW fingerprint is wrongly
    dropped; with K=4 probes the rate is (1 - e^(-4n/65536))^4 per bucket
    (~1.2e-5 at n=1,000 distinct fingerprints per bucket; resize BLOOM_BITS
    to the per-bucket cardinality target). Duplicates are NEVER emitted
    twice under either mode."""
    import pandas as pd

    src = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)
    bucketed = src.withColumn("bucket", F.crc32(F.col("fingerprint")) % DEDUP_BUCKETS)

    out_type = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("fingerprint", T.StringType()),
        ]
    )

    if state == "exact":
        state_type = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])

        def first_seen(key, pdfs, st):
            seen = set(st.get[0]) if st.exists else set()
            rows = []
            for pdf in pdfs:
                pdf = pdf.sort_values("doc_id")
                for r in pdf.itertuples(index=False):
                    if r.fingerprint not in seen:
                        seen.add(r.fingerprint)
                        rows.append((int(r.doc_id), r.fingerprint))
            st.update((sorted(seen),))
            yield pd.DataFrame(rows, columns=["doc_id", "fingerprint"])

    elif state == "bloom":
        state_type = T.StructType([T.StructField("bits", T.ArrayType(T.LongType()))])

        def first_seen(key, pdfs, st):
            import numpy as np

            if st.exists:
                bits = np.array(st.get[0], dtype=np.int64).view(np.uint64)
            else:
                bits = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
            rows = []
            for pdf in pdfs:
                pdf = pdf.sort_values("doc_id")
                for r in pdf.itertuples(index=False):
                    coords = _bloom_coords(r.fingerprint)
                    if not all(bits[w] & np.uint64(m) for w, m in coords):
                        for w, m in coords:
                            bits[w] |= np.uint64(m)
                        rows.append((int(r.doc_id), r.fingerprint))
            st.update((bits.view(np.int64).tolist(),))
            yield pd.DataFrame(rows, columns=["doc_id", "fingerprint"])

    else:
        raise ValueError(f"streaming_first_seen: unknown state mode {state!r}")

    return bucketed.groupBy("bucket").applyInPandasWithState(
        first_seen, out_type, state_type, "append", "NoTimeout"
    )


SCENE_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.LongType()),
        T.StructField("scene_date", T.DateType()),
        T.StructField("scene_date_str", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bands", T.IntegerType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)


def streaming_chip_ingest(
    spark: SparkSession,
    scenes_stream_dir: str,
    sf_dir: str,
    table,
    checkpoint: str,
) -> None:
    """The reference's ENTIRE dataset-generation job as a streaming ingest:
    new scene acquisitions land as parquet files, each micro-batch runs the
    full as-of -> burn -> chip pipeline on just its arrivals and commits a
    snapshot (the incremental analogue of the batch stage_chip resume).

    Exactly-once: the file-source checkpoint guarantees each arrival file
    joins exactly one epoch; the foreachBatch body is made idempotent per
    epoch by skipping a commit whose step name already exists in the
    snapshot log, so a crash between commit and checkpoint advance cannot
    double-append on restart (foreachBatch's documented at-least-once
    window). The step name is scoped to the CHECKPOINT identity, because
    epoch ids restart at 0 for a fresh checkpoint — an unscoped name would
    silently skip a new stream's first epochs against an existing table.
    availableNow trigger -> the same code serves continuous and catch-up
    runs."""
    import hashlib

    from terrakit_spark.pipeline import chip_pipeline

    ckpt_tag = hashlib.md5(checkpoint.encode()).hexdigest()[:8]
    src = spark.readStream.schema(SCENE_SCHEMA).parquet(scenes_stream_dir)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        step = f"stream_chip_{ckpt_tag}_epoch_{epoch_id}"
        if any(s.step == step for s in table.snapshots()):
            return  # epoch replay after a crash: already committed
        if batch_df.isEmpty():
            return
        chips = chip_pipeline(spark, sf_dir, scenes_df=batch_df)
        table.commit(chips, step=step, partition_col="scene_date_str")

    q = (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def batch_first_seen(spark: SparkSession, input_dirs: list[str]) -> DataFrame:
    """Batch equivalent: first batch wins, then min doc_id — the parity
    oracle for streaming_first_seen over the same files."""
    dfs = [
        spark.read.schema(DOC_SCHEMA).parquet(d).withColumn("_b", F.lit(i))
        for i, d in enumerate(input_dirs)
    ]
    allr = dfs[0]
    for d in dfs[1:]:
        allr = allr.unionByName(d)
    from pyspark.sql import Window as W

    w = W.partitionBy("fingerprint").orderBy(F.col("_b").asc(), F.col("doc_id").asc())
    return (
        allr.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("doc_id", "fingerprint")
    )


# --------------------------------------------------- streaming tile pyramid
MEDIA_POINT_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("mx", T.DoubleType()),
        T.StructField("my", T.DoubleType()),
    ]
)


def tile_pyramid_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Continuously-maintained level-12 quadkey tile rollup of a media
    point stream (the streaming face of operators/pyramid.py).

    The streaming aggregation state is the TILE table — bounded by the
    occupied-tile universe (<= 4^12 rows), NOT the point stream — which is
    what makes a 10^12-point continuous ingest viable: every aggregate here
    is decomposable (count/min/max), so each micro-batch folds into the
    state in place and no per-point state ever accumulates. Coarser pyramid
    levels cascade from this table in batch (quadkey_pyramid's
    explode-of-ancestors rollup); the stream maintains only the finest
    level, exactly the split a tile server wants (hot updates at the leaf,
    cheap periodic republish of the pyramid)."""
    from terrakit_spark.functions.cells import quadkey

    src = spark.readStream.schema(MEDIA_POINT_SCHEMA).parquet(input_dir)
    return src.groupBy(quadkey(F.col("mx"), F.col("my")).alias("qk")).agg(
        F.count("*").alias("n_points"),
        F.min("mx").alias("x_min"),
        F.max("mx").alias("x_max"),
        F.min("my").alias("y_min"),
        F.max("my").alias("y_max"),
    )


def tile_pyramid_batch(spark: SparkSession, input_dir: str) -> DataFrame:
    """Batch-parity twin of tile_pyramid_stream over the same files."""
    from terrakit_spark.functions.cells import quadkey

    src = spark.read.schema(MEDIA_POINT_SCHEMA).parquet(input_dir)
    return src.groupBy(quadkey(F.col("mx"), F.col("my")).alias("qk")).agg(
        F.count("*").alias("n_points"),
        F.min("mx").alias("x_min"),
        F.max("mx").alias("x_max"),
        F.min("my").alias("y_min"),
        F.max("my").alias("y_max"),
    )
