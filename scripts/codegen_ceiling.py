"""Pure-Spark whole-stage-codegen scaling control (no Python, registers
only): range(N) -> sum(pmod(xxhash64(id), 1000)). Reports local[8] vs
local[32] wall-clock and efficiency — the Spark-stack ceiling on this node
for the same epoch as a scaling/bench run (BENCH/BASELINE.md platform
controls)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(float(os.environ.get("CEILING_N", "6e9")))
REPS = int(os.environ.get("CEILING_REPS", "2"))


def run(cores: int) -> float:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("codegen_ceiling")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    best = 1e18
    for _ in range(REPS):
        t0 = time.time()
        spark.range(N, numPartitions=cores * 4).select(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1000)))
        ).collect()
        best = min(best, time.time() - t0)
    spark.stop()
    return best


def main() -> None:
    out = {}
    for c in (8, 32):
        out[str(c)] = round(run(c), 2)
    out["speedup"] = round(out["8"] / out["32"], 3)
    out["efficiency"] = round(out["8"] / out["32"] / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
