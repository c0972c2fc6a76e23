"""Extend the 100x fixture with the RELATIONAL tables + a linear-density
embedding variant (VERDICT r8 #5/#6).

Relational: apply the sf1 derivation (scripts_dev_make_sf1.py) a second
time on /tmp/sf1_scale — per-copy dense key offsets, region/nation fixed,
identical plan-relevant distributions — giving sf10-equivalent lineitem /
orders / customer / supplier / part / events (lineitem ~60M rows).  This
is where a hidden broadcast-threshold or shuffle-partition cliff would
show at 100x (TPC-H-shape joins), which the pipeline-only §21 step could
not see.

embeddings_lin: the §21 sf10 embeddings carried an 8000x-denser true-pair
output (noise +-0.1 keeps the 100 cumulative copies of the same base
vector mutually similar, so cross-copy pairs grow quadratically).  To
separate ENGINE slope from FIXTURE density, this variant keeps copy 0
verbatim and applies a deterministic per-(dim, copy) SIGN FLIP to the
others: within-copy geometry is EXACTLY preserved (norms and pairwise
cosines are sign-invariant), while cross-copy cosine collapses to ~0
(random sign patterns decorrelate), so true-pair volume grows linearly
with copies like a real corpus.

Usage: python scripts_dev_make_sf10_rel.py   (needs /tmp/sf1_scale)
Output: /tmp/sf10_scale/{region,nation,customer,supplier,part,orders,
lineitem,events,embeddings_lin}.parquet
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tensorbase_spark.session import get_spark

SRC = "/tmp/sf1_scale"
DST = "/tmp/sf10_scale"
COPIES = 10

# sf1 key strides = 10x the sf0.1 strides (dense key spaces)
STRIDE = {
    "customer": 150000,
    "supplier": 10000,
    "part": 200000,
    "orders": 1500000,
    "events": 1000000,
    "embeddings": 20000,
}


def main() -> None:
    spark = get_spark("make_sf10_rel")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    def src(name):
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{DST}/{name}.parquet').count()} rows")

    for name in ("region", "nation"):
        write(src(name), name)

    def copies(df, keyed):
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
        copies(src("customer"), {"c_custkey": STRIDE["customer"]}).drop("__copy"),
        "customer",
    )
    write(
        copies(src("supplier"), {"s_suppkey": STRIDE["supplier"]}).drop("__copy"),
        "supplier",
    )
    write(copies(src("part"), {"p_partkey": STRIDE["part"]}).drop("__copy"), "part")
    write(
        copies(
            src("orders"),
            {"o_orderkey": STRIDE["orders"], "o_custkey": STRIDE["customer"]},
        ).drop("__copy"),
        "orders",
    )
    write(
        copies(
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
            src("events"), {"event_id": STRIDE["events"], "user_id": 1000000}
        ).drop("__copy"),
        "events",
    )

    # linear-density embeddings: 100 sign-flip copies derived DIRECTLY
    # from sf0.1 (not from sf1 — the sf1 +-0.1 noise keeps its 10 copies
    # mutually pairing at the fixture threshold 0.4, so any further
    # scaling of sf1 carries that quadratic core along; measured 7.6M
    # pairs where linear density predicts ~92k).  Sign patterns are
    # uncorrelated across copies (cross-copy cos ~ N(0, 1/sqrt(dim)), a
    # >5-sigma miss at 0.4) while within-copy cosines are EXACT, so true
    # pairs = copies x sf0.1 pairs.
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    outs = []
    for i in range(100):
        c = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 2000))
        if i:
            c = c.withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, j) -> cast(x * "
                    f"(1 - 2 * pmod(xxhash64(j, {i}), 2)) as float))"
                ),
            )
        outs.append(c)
    lin = outs[0]
    for o in outs[1:]:
        lin = lin.unionByName(o)
    write(lin, "embeddings_lin")
    spark.stop()


if __name__ == "__main__":
    main()
