"""Derive a 100x-of-sf0.1 (sf10-equivalent) documents + embeddings fixture
by applying the sf1 derivation (scripts_dev_make_sf1.py) a SECOND time on
top of /tmp/sf1_scale — same distribution-preserving rules: within-copy
near-dup structure intact, cross-copy similarity collapsed by deterministic
token salting / embedding noise, so duplicate density stays linear.

Only the two pipeline tables are scaled (the 100x claim under test is the
dedup/ANN bucket-constancy story; the relational slope is covered at 10x by
PLANS §17/§20).  Output: /tmp/sf10_scale/{documents,embeddings}.parquet
(~100x sf0.1 bytes for these tables).  Usage: python scripts_dev_make_sf10.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tensorbase_spark.session import get_spark

SRC = "/tmp/sf1_scale"
DST = "/tmp/sf10_scale"
COPIES = 10
STRIDE = {"documents": 50000, "embeddings": 20000}
SALT = 1000  # distinct per-copy salt domain from the sf1 pass


def main() -> None:
    spark = get_spark("make_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    def copies(df, keyed):
        outs = []
        for i in range(COPIES):
            c = df
            for col, stride in keyed.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            outs.append(c.withColumn("__copy", F.lit(i + SALT)))
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out

    docs = copies(
        spark.read.parquet(f"{SRC}/documents.parquet"),
        {"doc_id": STRIDE["documents"]},
    )
    # TWO salt characters (676 variants), not one: with 100 cumulative
    # copies a 26-way suffix domain saturates the gram vocabulary (measured
    # 114k distinct bigrams for 500k docs — every gram becomes corpus-wide
    # "common", which manufactures cross-copy similarity no real corpus
    # has; web-scale vocabularies grow ~linearly with corpus size)
    salted = docs.withColumn(
        "text",
        F.when(F.col("__copy") == SALT, F.col("text")).otherwise(
            F.array_join(
                F.expr(
                    "transform(split(text, ' '), (w, j) -> case when "
                    "(j + __copy) % 3 = 0 and length(w) > 0 then "
                    "concat(w, char(97 + pmod(xxhash64(w, __copy), 26)), "
                    "char(97 + pmod(xxhash64(w, __copy, 7), 26))) "
                    "else w end)"
                ),
                " ",
            )
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))
    salted.drop("__copy").write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )
    print("documents:", spark.read.parquet(f"{DST}/documents.parquet").count())

    emb = copies(
        spark.read.parquet(f"{SRC}/embeddings.parquet"),
        {"vec_id": STRIDE["embeddings"]},
    )
    noisy = emb.withColumn(
        "embedding",
        F.when(F.col("__copy") == SALT, F.col("embedding")).otherwise(
            F.expr(
                "transform(embedding, (x, j) -> cast(x + "
                "(pmod(xxhash64(vec_id, j, __copy), 1000) / 1000.0 - 0.5) "
                "* 0.2 as float))"
            )
        ),
    )
    noisy.drop("__copy").write.mode("overwrite").parquet(
        f"{DST}/embeddings.parquet"
    )
    print("embeddings:", spark.read.parquet(f"{DST}/embeddings.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
