#!/usr/bin/env python
"""r15 write-path conf A/B (VERDICT r14 #8): re-test commit-algorithm v2
and parquet zstd on a calm window, interleaved within ONE session so box
drift cancels.  Usage:
  python scripts_dev_r15_writepath.py commitv2|zstd <runs_per_arm> <query>
Prints per-arm samples + best/p50.  SPARK_GRAFT_SF_DIR honored.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    mode, runs, name = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tensorbase_spark.queries import registry
    from tensorbase_spark.session import get_spark
    from tensorbase_spark.sources.tables import load_tables

    spark = get_spark("r15_writepath")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.count()
    q = registry()[name]

    def set_arm(arm: str) -> None:
        if mode == "commitv2":
            spark.sparkContext._jsc.hadoopConfiguration().set(
                "mapreduce.fileoutputcommitter.algorithm.version",
                "2" if arm == "B" else "1",
            )
        elif mode == "zstd":
            spark.conf.set(
                "spark.sql.parquet.compression.codec",
                "zstd" if arm == "B" else "snappy",
            )
        else:
            raise SystemExit(f"unknown mode {mode}")

    samples: dict[str, list[float]] = {"A": [], "B": []}
    order = ["A", "B"] * runs
    for i, arm in enumerate(order):
        set_arm(arm)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples[arm].append(round(time.perf_counter() - t0, 3))
    for arm in ("A", "B"):
        ss = sorted(samples[arm])
        label = {"A": "baseline", "B": mode}[arm]
        print(f"{name} {label}: best {ss[0]:.3f} p50 {ss[len(ss)//2]:.3f} all {samples[arm]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
