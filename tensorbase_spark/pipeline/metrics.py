"""Distributed evaluation metrics for model-in-the-loop data pipelines
(quality classifiers, dedup verifiers, retrieval scorers): the operators a
100 TB curation run needs to VALIDATE its filters, expressed so no step
ever needs a global sort.

Beyond the reference (its surface stops at SQL aggregates); the shapes are
standard public formulations (Mann-Whitney rank AUC; PR points from
cumulative bin sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bins: int = 10_000,
) -> DataFrame:
    """ROC-AUC of a binary classifier over arbitrarily many rows, one
    bounded shuffle.

    Scores quantize onto a ``bins``-point grid over [min, max] (a 10k grid
    bounds the quantization error of AUC at ~1/bins — far below any
    decision threshold anyone sets on it); per-bin positive/negative
    counts are ONE keyed shuffle whose output is ≤ bins rows; AUC then
    evaluates via the Mann-Whitney rank-sum over the cumulative bin sums
    — tied scores (same bin) get the standard half-credit.  The windows
    run over ≤ bins rows, so the 'global sort' is metadata-sized.

    Returns one row: (auc, n_pos, n_neg, n_bins_used).
    """
    s, y = F.col(score_col).cast("double"), F.col(label_col).cast("int")
    rng = df.agg(
        F.min(s).alias("lo"), F.max(s).alias("hi")
    )
    d = df.crossJoin(F.broadcast(rng))
    bin_id = F.when(
        F.col("hi") == F.col("lo"), F.lit(0)
    ).otherwise(
        F.least(
            F.floor((s - F.col("lo")) / (F.col("hi") - F.col("lo")) * bins),
            F.lit(bins - 1),
        )
    ).cast("long")
    per_bin = (
        d.select(bin_id.alias("b"), y.alias("y"))
        .groupBy("b")
        .agg(
            F.sum("y").alias("pos"),
            F.sum(1 - F.col("y")).alias("neg"),
        )
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_bin.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    # Mann-Whitney U: every (pos, neg) pair with pos-score > neg-score
    # scores 1, same-bin ties score 1/2
    agg = ranked.agg(
        F.sum(F.col("pos") * F.col("neg_below")).alias("u_win"),
        F.sum(F.col("pos") * F.col("neg") * 0.5).alias("u_tie"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.count("*").alias("n_bins_used"),
    )
    return agg.select(
        F.round(
            (F.col("u_win") + F.col("u_tie"))
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
        "n_pos", "n_neg", "n_bins_used",
    )


def precision_recall_points(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    thresholds: list[float] | None = None,
) -> DataFrame:
    """Precision/recall at fixed thresholds — the filter-calibration table
    a curation run reads before picking its keep-cutoff.  One map-only
    pass per threshold folded into a single aggregate (no shuffle beyond
    the final 1-row reduce); thresholds are a bounded literal list."""
    ts = thresholds if thresholds is not None else [i / 10 for i in range(1, 10)]
    s, y = F.col(score_col).cast("double"), F.col(label_col).cast("int")
    aggs = []
    for i, t in enumerate(ts):
        kept = (s >= F.lit(float(t))).cast("int")
        aggs += [
            F.sum(kept * y).alias(f"tp_{i}"),
            F.sum(kept).alias(f"kept_{i}"),
            F.sum(y).alias(f"pos_{i}"),
        ]
    one = df.agg(*aggs)
    rows = []
    for i, t in enumerate(ts):
        rows.append(
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.round(
                    F.col(f"tp_{i}") / F.greatest(F.col(f"kept_{i}"), F.lit(1)),
                    6,
                ).alias("precision"),
                F.round(
                    F.col(f"tp_{i}") / F.greatest(F.col(f"pos_{i}"), F.lit(1)),
                    6,
                ).alias("recall"),
                F.col(f"kept_{i}").alias("n_kept"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
