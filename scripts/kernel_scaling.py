"""Burn-kernel parallel-scaling isolation (round-5 scaling study).

The bench --scaling efficiency dropped 0.79 -> 0.60-0.65 at sf1 after the
edge-table kernel landed (the job got 4-6x faster). This script isolates
WHERE the lost efficiency lives: it runs the burn kernel alone — no Spark,
no shuffle, no Arrow — under multiprocessing at 8 vs 32 workers on the
hottest sf1 scene, plus a pure memory-bandwidth control (np.copy), and
reports per-level aggregate throughput and 8->32 efficiency for each.

If the kernel's own efficiency matches the Spark job's, the loss is the
node's DRAM wall (single socket; a real cluster brings bandwidth per
node) and not the engine's orchestration.

Usage: SPARK_GRAFT_SF_DIR=.work/sf1 python scripts/kernel_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", ".work/sf1")
NPZ = f"/tmp/hot_scene_{os.path.basename(SF_DIR.rstrip('/'))}.npz"


def extract_hot_scene() -> None:
    """One-time Spark pass: dump the hottest scene's burn input to NPZ."""
    from pyspark.sql import functions as F

    from terrakit_spark.operators.chips import SMALL_PRED_SQL
    from terrakit_spark.operators.rasterize import scene_label_pairs
    from terrakit_spark.operators.spatial_join import _register_views, materialize_synth
    from terrakit_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="hot_scene_extract", shuffle_partitions=32)
    work = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".work", f"bench_synth_{os.path.basename(SF_DIR.rstrip('/'))}")
    materialize_synth(spark, SF_DIR, work)
    _register_views(spark, SF_DIR)
    pairs = scene_label_pairs(spark, SMALL_PRED_SQL).cache()
    hot = pairs.groupBy("scene_id").count().orderBy(F.desc("count")).first()
    pdf = pairs.filter(F.col("scene_id") == hot["scene_id"]).orderBy("geom_seq").toPandas()
    np.savez(
        NPZ,
        scene_id=hot["scene_id"],
        width=int(pdf["width"].iloc[0]), height=int(pdf["height"].iloc[0]),
        xmin=float(pdf["xmin"].iloc[0]), ymax=float(pdf["ymax"].iloc[0]),
        cx=pdf["cx"].to_numpy(), cy=pdf["cy"].to_numpy(),
        rx=pdf["rx"].to_numpy(), ry=pdf["ry"].to_numpy(),
        cls=pdf["labelclass"].to_numpy(),
    )
    print(f"extracted scene {hot['scene_id']}: {len(pdf)} polys -> {NPZ}", file=sys.stderr)
    spark.stop()


def _burn_worker(args):
    reps, n_polys = args
    d = np.load(NPZ)
    from terrakit_spark.operators.rasterize import burn_image

    cx, cy, rx, ry = d["cx"][:n_polys], d["cy"][:n_polys], d["rx"][:n_polys], d["ry"][:n_polys]
    cls = list(d["cls"][:n_polys])
    polys = [
        np.array([[a - b, c], [a, c - e], [a + b, c], [a, c + e]], dtype=np.float64)
        for a, c, b, e in zip(cx, cy, rx, ry)
    ]
    t0 = time.time()
    for _ in range(reps):
        burn_image(int(d["width"]), int(d["height"]), float(d["xmin"]), float(d["ymax"]), polys, cls)
    return time.time() - t0


def _copy_worker(args):
    reps, _ = args
    a = np.random.default_rng(0).integers(0, 255, size=50_000_000, dtype=np.uint8)
    t0 = time.time()
    for _ in range(reps):
        b = a.copy()
        del b
    return time.time() - t0


def level(worker, procs: int, reps: int, n_polys: int) -> float:
    """Aggregate tasks/sec with `procs` concurrent workers."""
    with mp.Pool(procs) as pool:
        t0 = time.time()
        pool.map(worker, [(reps, n_polys)] * procs)
        wall = time.time() - t0
    return procs * reps / wall


def main() -> None:
    if not os.path.exists(NPZ):
        extract_hot_scene()
    d = np.load(NPZ)
    n_full = len(d["cx"])
    out: dict = {"sf_dir": SF_DIR, "scene_polys": n_full}
    for name, worker, reps, n_polys in (
        ("burn_hot", _burn_worker, 2, n_full),
        ("burn_10k", _burn_worker, 8, min(10_000, n_full)),
        ("memcpy_50MB", _copy_worker, 40, 0),
    ):
        r = {}
        for p in (8, 32):
            r[str(p)] = round(level(worker, p, reps, n_polys), 3)
        r["efficiency"] = round(r["32"] / r["8"] / 4.0, 3)
        out[name] = r
        print(json.dumps({name: r}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
