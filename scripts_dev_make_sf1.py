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
"""

from __future__ import annotations

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


def main() -> None:
    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    def src(name):
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{DST}/{name}.parquet').count()} rows")

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
    spark.stop()


if __name__ == "__main__":
    main()
