"""Derive a 10x (sf1-equivalent) dataset from the driver's sf0.1 fixtures
for the round-7 scale-slope proof (VERDICT r6 #1).

The driver generates sf{0.001,0.01,0.1} only; this script scales sf0.1 by
ten WITHOUT changing any distribution a plan depends on:

- dimension/fact keys offset per copy (dense key space, same fan-outs,
  same selectivity of every filter — q1/q3/q9/q21 see 10x rows through
  identical plans);
- region/nation stay fixed (TPC-H scaling rule);
- events keep their time range (10x density, 10x users — the stream
  shape of a larger deployment);
- documents: copies > 0 pass through a per-copy deterministic token
  salting (a pure function of (token, position mod 3, copy)), so
  WITHIN-copy near-dup structure is preserved exactly while CROSS-copy
  similarity collapses — near-dup pair volume grows linearly like a real
  corpus, not quadratically like naive duplication would force;
- embeddings: per-(vec, dim, copy) hash noise at +-0.1 — same geometry
  per copy, no cross-copy exact duplicates.

Output: /tmp/sf1_scale/*.parquet (outside the repo on purpose — derived
perf fixture, ~10x sf0.1 bytes).  Usage: python scripts_dev_make_sf1.py

r15 (VERDICT r14 #1 / r13 #6 — pin the fixture layout): every table is
written through a DETERMINISTIC layout — repartitionByRange on its key
into a fixed partition count + sortWithinPartitions(key) — and the script
records a manifest (per-file row counts + a per-table content hash:
sum/xor of xxhash64 over every column) to plans/r15/sf1_manifest.json in
the repo.  The data itself was always a pure function of sf0.1 (key
offsets + xxhash salting); pinning the file/row-group layout makes
BENCH_sf1 runs comparable across rounds — scan parallelism and row-group
boundaries no longer depend on whatever parallelism the generating
session happened to have.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tensorbase_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_scale"
COPIES = 10

# exact sf0.1 key strides (row counts == max dense key)
STRIDE = {
    "customer": 15000,
    "supplier": 1000,
    "part": 20000,
    "orders": 150000,
    "events": 100000,
    "documents": 5000,
    "embeddings": 2000,
}

# deterministic layout: (sort/range key, output file count) per table.
# File counts keep scan-task sizing in the driver-bench's working range
# (lineitem ~6M rows -> 16 files of ~375k rows; dims 1-2 files).
LAYOUT = {
    "region": ("r_regionkey", 1),
    "nation": ("n_nationkey", 1),
    "customer": ("c_custkey", 2),
    "supplier": ("s_suppkey", 1),
    "part": ("p_partkey", 2),
    "orders": ("o_orderkey", 8),
    "lineitem": ("l_orderkey", 16),
    "events": ("event_id", 8),
    "documents": ("doc_id", 4),
    "embeddings": ("vec_id", 2),
}


def main() -> None:
    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    manifest: dict[str, dict] = {}

    def src(name):
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def write(df, name):
        key, nfiles = LAYOUT[name]
        out = (
            df.repartitionByRange(nfiles, F.col(key))
            .sortWithinPartitions(key)
        )
        out.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        back = spark.read.parquet(f"{DST}/{name}.parquet")
        cols = [F.col(c).cast("string") for c in sorted(back.columns)]
        agg = back.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(*cols)).alias("hsum"),
        ).collect()[0]
        import pyarrow.parquet as pq

        files = sorted(
            f for f in os.listdir(f"{DST}/{name}.parquet") if f.endswith(".parquet")
        )
        manifest[name] = {
            "rows": agg.n,
            "content_hash_sum": agg.hsum,
            "files": [
                {
                    "rows": pq.ParquetFile(
                        os.path.join(f"{DST}/{name}.parquet", f)
                    ).metadata.num_rows,
                    "row_groups": pq.ParquetFile(
                        os.path.join(f"{DST}/{name}.parquet", f)
                    ).metadata.num_row_groups,
                }
                for f in files
            ],
        }
        print(f"{name}: {agg.n} rows, hash_sum {agg.hsum}")

    for name in ("region", "nation"):
        write(src(name), name)

    def copies(name, df, keyed):
        """Union COPIES copies with per-copy key offsets."""
        outs = []
        for i in range(COPIES):
            c = df
            for col, stride in keyed.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            outs.append(c.withColumn("__copy", F.lit(i)))
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out

    write(
        copies("customer", src("customer"), {"c_custkey": STRIDE["customer"]})
        .drop("__copy"),
        "customer",
    )
    write(
        copies("supplier", src("supplier"), {"s_suppkey": STRIDE["supplier"]})
        .drop("__copy"),
        "supplier",
    )
    write(
        copies("part", src("part"), {"p_partkey": STRIDE["part"]}).drop("__copy"),
        "part",
    )
    write(
        copies(
            "orders",
            src("orders"),
            {"o_orderkey": STRIDE["orders"], "o_custkey": STRIDE["customer"]},
        ).drop("__copy"),
        "orders",
    )
    write(
        copies(
            "lineitem",
            src("lineitem"),
            {
                "l_orderkey": STRIDE["orders"],
                "l_partkey": STRIDE["part"],
                "l_suppkey": STRIDE["supplier"],
            },
        ).drop("__copy"),
        "lineitem",
    )
    write(
        copies(
            "events",
            src("events"),
            {"event_id": STRIDE["events"], "user_id": 100000},
        ).drop("__copy"),
        "events",
    )

    docs = copies("documents", src("documents"), {"doc_id": STRIDE["documents"]})
    salted = docs.withColumn(
        "text",
        F.when(F.col("__copy") == 0, F.col("text")).otherwise(
            F.array_join(
                F.expr(
                    "transform(split(text, ' '), (w, j) -> case when "
                    "(j + __copy) % 3 = 0 and length(w) > 0 then "
                    "concat(w, char(97 + pmod(xxhash64(w, __copy), 26))) "
                    "else w end)"
                ),
                " ",
            )
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))
    write(salted.drop("__copy"), "documents")

    emb = copies("embeddings", src("embeddings"), {"vec_id": STRIDE["embeddings"]})
    noisy = emb.withColumn(
        "embedding",
        F.when(F.col("__copy") == 0, F.col("embedding")).otherwise(
            F.expr(
                "transform(embedding, (x, j) -> cast(x + "
                "(pmod(xxhash64(vec_id, j), 1000) / 1000.0 - 0.5) * 0.2 "
                "as float))"
            )
        ),
    )
    write(noisy.drop("__copy"), "embeddings")
    man_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r15",
        "sf1_manifest.json",
    )
    os.makedirs(os.path.dirname(man_path), exist_ok=True)
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"manifest -> {man_path}")
    spark.stop()


if __name__ == "__main__":
    main()
