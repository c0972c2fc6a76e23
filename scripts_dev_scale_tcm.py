"""Dev: 100x scale step for the TEXT / CURATION / MULTIMODAL families
(PLANS §25; VERDICT r9 #4).  §21/§22 covered dedup/similarity/relational;
this sweeps the remaining bench-visible families:

* text_bm25_topk, corpus_build_end_to_end, corpus_bloom_decontaminate —
  the registry callables, timed as-is on sf0.1 -> /tmp/sf1_scale ->
  /tmp/sf10_scale (documents-only fixtures from scripts_dev_make_sf1/10).
* image-hash near-dup (pHash + banded hamming pairing) — synthesized
  16x16 PNG assets at 2k / 20k / 200k with CONSTANT class size (25
  members), so the near-dup output grows linearly and the banded join's
  bucket-constancy is what's under test.

Usage: python scripts_dev_scale_tcm.py   (regenerate /tmp fixtures first)
"""
from __future__ import annotations

import time

from pyspark.sql import functions as F

from tensorbase_spark.session import get_spark


def best_of(fn, n=2):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> int:
    spark = get_spark("scale_tcm")
    spark.sparkContext.setLogLevel("ERROR")
    from tensorbase_spark.queries import registry

    reg = registry()
    sf_dirs = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", "/tmp/sf1_scale"),
        ("sf10", "/tmp/sf10_scale"),
    ]
    import sys
    names = [] if "--phash-only" in sys.argv else [
        "text_bm25_topk", "corpus_build_end_to_end",
        "corpus_bloom_decontaminate",
    ]
    for name in names:
        q = reg[name]
        row = [name]
        for tag, d in sf_dirs:
            t = best_of(lambda: q.fn(spark, d).collect())
            row.append(f"{tag}={t:.2f}s")
        print("  ".join(row), flush=True)

    # -- image-hash near-dup at constant class size --------------------
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from tensorbase_spark.pipeline import multimodal

    def run_phash(n_assets: int) -> float:
        cls_n = n_assets // 25  # constant 25 members per class

        def _synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            for pdf in batches:
                ids = pdf["asset_id"]
                payloads = []
                for i in ids:
                    i = int(i)
                    cls, gain, off = i % cls_n, 1 + i % 3, 12 * (i % 5)

                    # a per-class 64-bit key drives an 8x8 block SIGN
                    # pattern — pHash's bits mirror the block structure,
                    # so distinct classes land on distinct hashes (smooth
                    # per-pixel formulas collapsed many classes onto one
                    # hash and made the pair count superlinear)
                    key = (cls * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)

                    def px(x, y, key=key, gain=gain, off=off):
                        bit = (key >> ((x // 2) * 8 + y // 2)) & 1
                        return (10 + 40 * bit) * gain + off

                    payloads.append(multimodal.encode_png(16, 16, px))
                yield pd.DataFrame(
                    {"asset_id": ids, "payload": payloads})

        assets = spark.range(n_assets).select(
            F.col("id").alias("asset_id"))
        pngs = assets.repartition(32).mapInPandas(
            _synth,
            T.StructType([
                T.StructField("asset_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
            ]),
        )

        def body():
            hashed = multimodal.image_phash(pngs)
            pairs = multimodal.image_neardup_pairs(hashed, max_hamming=0)
            n = pairs.count()
            return n

        t0 = time.perf_counter()
        n_pairs = body()
        dt = time.perf_counter() - t0
        print(f"phash_neardup assets={n_assets} classes={cls_n} "
              f"pairs={n_pairs} wall={dt:.2f}s", flush=True)
        return dt

    run_phash(2000)  # warm-up (Arrow/UDF/codegen) — discard
    print("-- warm --", flush=True)
    for n in (2000, 20000, 200000):
        run_phash(n)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
