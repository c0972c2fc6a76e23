"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB of documents, 1000 executors):
- exact: one shuffle on a 128-bit content hash; group sizes are tiny
  (duplicate cluster cardinality), no skew risk beyond pathological
  boilerplate docs — which the md5 key spreads anyway.
- MinHash+LSH: per-doc signatures via an Arrow-batched pandas UDF (see
  pipeline/hashing.py for why NOT Column higher-order functions), band keys
  explode -> self-join *within band buckets only*; the only all-pairs work
  is inside a bucket, and bucket sizes are bounded by the band-hash
  collision rate, not corpus size.
- verification joins carry per-doc shingle-hash arrays: bounded by document
  length, independent of corpus size.
- SimHash: one fingerprint per doc (same UDF pass), 16-bit-band hamming join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tensorbase_spark.pipeline import hashing

# MinHash parameters: 96 hashes = 24 bands x 4 rows.
# P(candidate | J=0.8) = 1-(1-0.8^4)^24 ≈ 0.999997; P(candidate | J=0.3) ≈ 0.17.
N_HASHES = hashing.N_HASHES
N_BANDS = hashing.N_BANDS
ROWS_PER_BAND = hashing.ROWS_PER_BAND


SHINGLE_N = 3


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = SHINGLE_N) -> DataFrame:
    """Distinct n-word shingles per document: (id, token).

    Shingles (not unigrams) are the MinHash unit — unigram sets saturate on
    small vocabularies, while shingle sets track local word order, which is
    what near-duplicate detection needs.

    The input is repartitioned by doc id first: the driver's fixture tables
    are single parquet files, so without this the shingle explode + hash
    compute (the expensive part) runs in ONE scan task regardless of cluster
    size.  The repartition shuffles only the raw docs (cheap) and unlocks
    full-width parallelism for everything downstream.  The partition count is
    explicit — a bare repartition(col) of a few-MB doc table gets coalesced
    right back to one partition by AQE, which optimizes shuffle bytes, not
    the downstream compute-per-row."""
    # CRITICAL expression-shape rule: never reference the split() inside a
    # lambda.  element_at(split(text), i) inside a transform() lambda makes
    # interpreted higher-order-function eval recompute the regex split for
    # EVERY element — O(words^2) regex work per doc (a jstack of a stuck
    # 150s-CPU task showed exactly that loop: StringSplit.nullSafeEval under
    # ConcatWs under ArrayTransform).  And no plan shape protects you:
    # ProjectCollapse / ColumnPruning will inline a words-array projection
    # through an exchange right back into the lambda.  zip_with + slice keeps
    # every split occurrence OUTSIDE the lambdas, so each evaluates once per
    # row no matter how Catalyst rearranges the plan.
    w = F.split(F.col(text_col), r"\s+")
    big = F.greatest(F.size(w) - 1, F.lit(0))
    shifted = [F.slice(w, k + 2, big) for k in range(n - 1)]  # w offset by 1..n-1
    z = w
    for s in shifted:
        z = F.zip_with(z, s, lambda a, b: F.concat_ws(" ", a, b))
    # zip_with pads the shorter side with null and concat_ws skips nulls, so
    # the tail elements are partial shingles — slice them off.
    sh = F.when(
        F.size(w) >= n,
        F.array_distinct(F.slice(z, 1, F.size(w) - (n - 1))),
    ).otherwise(F.array(F.col(text_col)))
    return _repartitioned(docs, id_col).select(
        F.col(id_col).alias("_id"), F.explode(sh).alias("token")
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-hash groupBy: one shuffle on md5(text).
    Returns one row per duplicated content: (content_hash, n_copies, keep_id)
    where keep_id is the smallest doc id (the canonical survivor)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min(F.col(id_col)).alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def _repartitioned(docs: DataFrame, id_col: str) -> DataFrame:
    """Docs spread over the full task width before any UDF work.

    The driver's fixture tables are single parquet files, so without this
    every pandas-UDF pass (the expensive part) runs in ONE scan task
    regardless of cluster size.  The repartition shuffles only the raw docs
    (cheap) and unlocks full-width parallelism downstream.  The partition
    count is explicit — a bare repartition(col) of a few-MB table gets
    coalesced right back to one partition by AQE, which optimizes shuffle
    bytes, not downstream compute-per-row."""
    from tensorbase_spark.session import default_parallelism

    return docs.repartition(default_parallelism(), F.col(id_col))


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc 96-element MinHash signature: (_id, sig array<long>).

    One Arrow-batched UDF pass over the text — no token explode, no
    96-aggregate shuffle; the only shuffle is the doc-spreading repartition."""
    return _repartitioned(docs, id_col).select(
        F.col(id_col).alias("_id"),
        hashing.minhash_signature(F.col(text_col)).alias("sig"),
    )


def _band_array(sig: F.Column) -> F.Column:
    """24 band hashes from the signature array (4 rows per band) — plain
    codegen expressions (GetArrayItem + xxhash64), nothing interpreted."""
    bands = []
    for b in range(N_BANDS):
        elems = [sig[b * ROWS_PER_BAND + r] for r in range(ROWS_PER_BAND)]
        bands.append(F.xxhash64(F.lit(b), *elems))
    return F.array(*bands)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash/LSH near-duplicate pairs, exact-Jaccard verified.

    Pipeline: signatures -> band explode -> bucket self-join (candidates) ->
    verify with exact token-set Jaccard >= threshold.
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    Signature and verify-set come from ONE Arrow pass (minhash_features),
    persisted MEMORY_AND_DISK because three plan branches consume it (band
    explode + both verify joins) — without the persist each branch would
    re-shingle the corpus.  The persist is the local stand-in for the
    materialize-features-to-storage step a 100 TB run would do anyway
    (compare the IVF index in pipeline/similarity.py, which persists its
    assignments to partitioned parquet)."""
    from pyspark.storagelevel import StorageLevel

    feats = (
        _repartitioned(docs, id_col)
        .select(
            F.col(id_col).alias("_id"),
            hashing.minhash_features(F.col(text_col)).alias("ft"),
        )
        .select("_id", F.col("ft.sig").alias("sig"), F.col("ft.toks").alias("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands = feats.select(
        "_id", F.posexplode(_band_array(F.col("sig"))).alias("band_idx", "band_hash")
    )
    left = bands.alias("l")
    right = bands.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    # Verify on 64-bit shingle hashes, not strings: set-intersection over
    # longs is ~10-20x cheaper per pair than over strings (string hashing +
    # per-element type dispatch dominated the profile), and a 64-bit
    # collision perturbing a Jaccard count is a ~2^-63-per-pair event.
    # Same UDF family as the signatures, so hash-set Jaccard == string-set
    # Jaccard on everything but astronomically unlikely collisions.
    a = feats.select(F.col("_id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = feats.select(F.col("_id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """63-bit SimHash per document (bit 63 left clear to stay in signed long).

    Per shingle bit j contributes +1/-1; fingerprint bit j = sign of the sum.
    Whole fingerprint in one Arrow-batched UDF pass — no shingle explode, no
    63-aggregate shuffle."""
    return _repartitioned(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        hashing.simhash64(F.col(text_col)).alias("simhash"),
    )


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= max_hamming.

    Banding: 4 x 16-bit bands; any pair within hamming<=3 shares at least one
    exact band (pigeonhole), so the candidate join is band-bucketed — never
    all-pairs.  Verification is bit_count(xor) on the two fingerprints."""
    if max_hamming > 3:
        raise ValueError(
            "simhash_near_pairs: 4x16-bit banding guarantees recall only for "
            f"max_hamming <= 3 (pigeonhole); got {max_hamming}"
        )
    fps = simhash_fingerprints(docs, text_col, id_col)
    bands = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftrightunsigned(F.col("simhash"), 16 * k).bitwiseAND(F.lit(0xFFFF)))
                    for k in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.col("l.simhash").alias("fp_a"),
            F.col("r.simhash").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def ngram_jaccard_pairs(
    docs: DataFrame,
    n_chars_col: str = "n_chars",
    lang_col: str = "lang",
    threshold: float = 0.6,
    df_map_limit: int = 1_000_000,
    n_docs: int | None = None,
    demote_min_docs: int = 20000,
) -> DataFrame:
    """Exact word-bigram Jaccard near-dup pairs over (same lang, |n_chars|
    within 20) — fully SQL-expressible, so this one has a DuckDB oracle.

    Candidate generation is PREFIX FILTERING (SSJoin/Bayardo): under any
    global total order on grams, two sets with J >= t MUST share an element
    inside each one's prefix of the floor((1-t)*|S|)+1 smallest grams —
    if the smallest shared gram x were outside A's prefix, A would hold
    >= floor((1-t)|A|)+1 grams smaller than x and disjoint from B, forcing
    J < t.  So candidates come from an equi-join on the exploded prefix
    grams (64-bit hash order), which is similarity-aware: candidate volume
    tracks the corpus's actual shared-phrase density, not its size.  The
    r2 length-bucket blocking this replaces ((lang, 20-char bucket)
    equi-join) was quadratic in corpus size whenever lengths concentrate —
    a 10x corpus with 1x duplicate density took ~100x candidate pairs
    (measured 51 s vs 6.3 s for this plan; PLANS.md §8).  The ppjoin
    POSITIONAL filter then prunes candidates before the verify joins (the
    fixture's template docs share many phrases, so ~150k pairs share a
    rare prefix gram; the rank bound keeps only pairs that can still reach
    the threshold — measured 4.1 s -> 1.7 s at sf0.1, within noise of the
    old blocking join while scaling an asymptotic class better).  The
    cheap (lang, +/-20 chars) predicates ride along as join residuals,
    preserving the operator's documented pair domain and its oracle.

    The GLOBAL GRAM ORDER is df-ASCENDING — textbook ppjoin (r8, VERDICT
    r7 #3): each doc's prefix holds its RAREST grams, so candidate pairs
    form only on grams rare for BOTH docs.  Prefix filtering stays
    lossless under ANY total order (the Bayardo proof never uses which
    order), only candidate volume changes.  The evidence trail: hash-order
    prefixes produced 26.7x candidate volume for 10x data (90.5% of pair
    volume from the top-1024 grams); a two-class top-K-demoted order fixed
    the 10x step but left 24M candidates at 100x — this synthetic corpus's
    gram vocabulary saturates (mean df grows with n), so only the FULL df
    order keeps prefixes rare.  The (gram -> df) map rides in the Arrow
    UDF closure as two sorted numpy arrays (searchsorted lookup): grams
    with df==1 are omitted (absent = df 1; they cannot pair anyway), and
    the map is capped at ``df_map_limit`` highest-df grams — beyond the
    cap the order degrades gracefully to the two-class shape (any
    deterministic map still yields ONE consistent total order).  The map
    arrives via Arrow (``toPandas`` -> two int64 numpy arrays, ~16 MB at
    the 1M-gram default) rather than Row objects, and ships once per
    executor in the UDF closure.  At 100 TB the map becomes a broadcast
    df join / sampled sketch; same plan shape.
    Deterministic: ties break on gram hash everywhere.

    The df order is COST-BASED: the df aggregation + Arrow prefix pass
    cost ~0.5 s of fixed work at local scale, which a small corpus's
    candidate volume cannot repay (measured: sf0.1 hash order 1.9-2.1 s vs
    df order 2.2 s; sf1 df order 4.3 s vs hash order ~7.4 s; sf10 df order
    21.9 s vs two-class 44-82 s — PLANS §19/§21).  Callers that know the
    corpus size pass ``n_docs`` (catalog stats / parquet footer) and
    corpora under ``demote_min_docs`` keep the cheaper hash order; unknown
    size defaults to the df order — the scale-safe choice.  All orders
    are lossless, so the RESULT is identical either way (pinned by
    test)."""
    from tensorbase_spark.session import default_parallelism

    W = 20
    # Jaccard runs on 64-bit bigram hashes, not the strings themselves:
    # numerically identical (a collision is a ~2^-63-per-pair event; the
    # DuckDB oracle's string-based jaccard still hash-matches) and an order
    # of magnitude cheaper per candidate pair — string array_intersect
    # (hash + per-element dispatch) dominated the join profile.  The hashes
    # come from an Arrow-batched UDF (pipeline/hashing.py) rather than
    # split+zip_with+xxhash64 Column expressions: higher-order functions are
    # CodegenFallback and their interpreted eval destabilized the whole JVM.
    # persist: the prefix branch AND both verify branches consume the
    # bigram arrays — one Arrow pass total, cached MEMORY_AND_DISK (the
    # local stand-in for materializing features once at 100 TB)
    from pyspark.storagelevel import StorageLevel

    d = (
        docs.repartition(default_parallelism(), F.col("doc_id"))
        .select(
            F.col("doc_id"), F.col(lang_col).alias("lang"),
            F.col(n_chars_col).alias("nc"),
            hashing.bigram_hash_set(F.col("text")).alias("bg"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # Two phases, like minhash_lsh_pairs: (1) candidate pairs from the CHEAP
    # blocking predicates only — no arrays carried, so the blocking join
    # condition stays cheap; (2) fetch each side's bigram array by doc id and
    # verify jaccard.  Keeping the jaccard expression away from the blocking
    # join matters: a both-sides filter gets pushed into the join condition,
    # where Catalyst ordered it BEFORE the cheap predicates — measured 20x
    # slower (every key-equal pair paid two array ops).  In the id-equi
    # verify joins the pushed-in predicate only ever sees true candidate
    # pairs, which is exactly the work the operator must do.
    # prefix of the floor((1-t)*|bg|)+1 smallest gram hashes per doc; the
    # join key is the single gram hash (high cardinality, clean shuffle).
    # posexplode keeps each gram's RANK in the full sorted set for the
    # positional filter below.
    if n_docs is None or n_docs >= demote_min_docs:
        # the (gram -> df) map: ONE aggregation (explode -> count), df==1
        # grams omitted (absent means df 1 — a hapax gram can never form a
        # pair), capped at the df_map_limit HIGHEST dfs.  The map ships in
        # the Arrow UDF closure as two gram-sorted numpy arrays; lookup is
        # one vectorized searchsorted per doc.
        # Arrow collect (toPandas), NOT Row objects: at the cap this is two
        # contiguous 8-byte columns (~2x8 MB at the 1M default) instead of
        # hundreds of MB of driver-side Row objects (ADVICE r8 #5); the UDF
        # closure then pickles just the two numpy arrays
        df_pdf = (
            d.select(F.explode("bg").alias("gram"))
            .groupBy("gram")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") >= 2)
            .orderBy(F.desc("df"), "gram")
            .limit(df_map_limit)
            .toPandas()
        )
        import numpy as np

        _G = df_pdf["gram"].to_numpy(dtype=np.int64)
        _DF = df_pdf["df"].to_numpy(dtype=np.int64)
        _order = np.argsort(_G)
        G_sorted, DF_sorted = _G[_order], _DF[_order]
        thr_f = float(threshold)

        from pyspark.sql import types as T

        _pref_schema = T.ArrayType(
            T.StructType(
                [
                    T.StructField("pos", T.IntegerType()),
                    T.StructField("gram", T.LongType()),
                ]
            )
        )

        @pandas_udf(_pref_schema)
        def _prefix(bg: pd.Series) -> pd.Series:
            # per-doc prefix under the (df, gram) total order, carrying
            # each prefix gram's RANK in the doc's fully-sorted gram list
            # (the positional filter needs ranks, not prefix offsets);
            # vectorized — searchsorted df lookup + one lexsort per doc
            out = []
            for arr in bg:
                if arr is None or len(arr) == 0:
                    out.append([])
                    continue
                a = np.asarray(arr, dtype=np.int64)
                if len(G_sorted):
                    idx = np.searchsorted(G_sorted, a)
                    idx_c = np.minimum(idx, len(G_sorted) - 1)
                    hit = G_sorted[idx_c] == a
                    df_a = np.where(hit, DF_sorted[idx_c], 1)
                else:
                    df_a = np.ones(len(a), dtype=np.int64)
                order = np.lexsort((a, df_a))
                plen = int(len(a) * (1.0 - thr_f)) + 1
                out.append(
                    [(i, int(g)) for i, g in enumerate(a[order[:plen]])]
                )
            return pd.Series(out)

        pref = d.select(
            "doc_id", "lang", "nc", F.size("bg").alias("sz"),
            F.explode(_prefix(F.col("bg"))).alias("pg"),
        ).select(
            "doc_id", "lang", "nc", "sz",
            F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"),
        )
    else:
        # small known corpus: plain 64-bit hash order, all-JVM prefix.
        # bigram_hash_set returns the array SORTED ASCENDING (its r15
        # contract), so the prefix is a plain slice — the array_sort that
        # used to run here executed an interpreted lambda comparator
        # inside BOTH self-join Generate branches (guide §4.2: the sort
        # belongs in the vectorized Arrow pass that builds the array).
        plen = (F.floor(F.size("bg") * F.lit(1.0 - threshold)) + 1).cast("int")
        pref = d.select(
            "doc_id", "lang", "nc", F.size("bg").alias("sz"),
            F.posexplode(
                F.slice(F.col("bg"), F.lit(1), plen)
            ).alias("pos", "gram"),
        )
    a_keys = pref.alias("a")
    b_keys = pref.alias("b")
    # Positional filter (ppjoin): the pair's smallest shared gram x (= the
    # min observed rank on BOTH sides, since rank order == gram order)
    # bounds the intersection: |A∩B| <= min(|A|-rank_A(x), |B|-rank_B(x)),
    # while J >= t forces |A∩B| >= t(|A|+|B|)/(1+t).  Pairs failing the
    # bound can't reach the threshold and never enter the verify joins —
    # the pair groupBy replaces the dedup shuffle, so this costs nothing.
    # (+1e-9 slack: a float-inexact threshold must never drop a boundary
    # pair; a false keep just pays one verify row.)
    req = F.lit(threshold / (1.0 + threshold)) * (F.col("sza") + F.col("szb"))
    cand = (
        a_keys.join(
            b_keys,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.abs(F.col("a.nc") - F.col("b.nc")) <= W),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(
            F.min("a.pos").alias("mpa"), F.min("b.pos").alias("mpb"),
            F.min("a.sz").alias("sza"), F.min("b.sz").alias("szb"),
        )
        .filter(
            F.least(F.col("sza") - F.col("mpa"), F.col("szb") - F.col("mpb"))
            + F.lit(1e-9)
            >= req
        )
        .select("id_a", "id_b")
    )

    arrays = d.select("doc_id", "bg")
    aa = arrays.select(F.col("doc_id").alias("id_a"), F.col("bg").alias("bg_a"))
    bb = arrays.select(F.col("doc_id").alias("id_b"), F.col("bg").alias("bg_b"))
    inter = F.size(F.array_intersect("bg_a", "bg_b"))
    union = F.size(F.array_union("bg_a", "bg_b"))
    return (
        cand.join(aa, "id_a")
        .join(bb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Undirected connected components over near-dup pairs:
    (id_a, id_b) -> (doc_id, cluster_id) with cluster_id = min doc_id in the
    component.  This is the step that turns pairwise near-dup detection into
    an actual deduplicated corpus (keep cluster_id == doc_id, drop the rest).

    Iterative min-label propagation: label(n) <- min(label(n), labels of
    neighbors), repeated until a fixpoint.  Converges in O(component
    diameter) rounds — near-dup graphs are overwhelmingly tiny star/clique
    components, so 3-4 rounds in practice.  Each round is one shuffle join
    keyed on node id; localCheckpoint() truncates the plan lineage so round
    N's plan doesn't re-derive rounds 1..N-1 (the classic iterative-algorithm
    trap on Spark).  The only driver-side work is a convergence count.
    At larger diameters swap in large-star/small-star (Kiveris et al.) —
    same join shape, fewer rounds."""
    edges = pairs.select("id_a", "id_b")
    sym = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("id_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.id_b") == F.col("l.node"))
            .select(F.col("e.id_a").alias("node"), F.col("l.label").alias("label"))
        )
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # silently returning partial clusters would split duplicate families
        # into several "canonical" survivors — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or switch to "
            "large-star/small-star for high-diameter graphs"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def connected_components_star(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components via alternating large-star/small-star (Kiveris
    et al., "Connected Components in MapReduce and Beyond") — same output
    contract as connected_components: (doc_id, cluster_id = component min).

    This is the high-diameter scale path: convergence in O(log n) rounds
    regardless of component diameter, where min-label propagation needs
    O(diameter) rounds (a 10^6-node boilerplate chain would take 10^6
    propagation rounds but ~20 star rounds).  Per round: two groupBy+join
    passes (large-star hangs every node's big neighbors onto its minimum;
    small-star re-hangs the small neighbors), each an equi-join on node id
    — shuffles scale with |E|, skew on hub nodes is AQE-split.
    localCheckpoint truncates lineage each round.  Convergence = edge-set
    fixpoint, detected by a deterministic count+hash aggregate."""
    edges = (
        pairs.select(
            F.least("id_a", "id_b").alias("u"), F.greatest("id_a", "id_b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        pairs.select(F.col("id_a").alias("node"))
        .union(pairs.select(F.col("id_b").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def edge_sig(e: DataFrame):
        r = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        return (r.n, r.h)

    sig = edge_sig(edges)
    for _ in range(max_iter):
        # large-star: for each node, connect every LARGER neighbor to the
        # minimum of (neighbors ∪ self)
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.withColumn("mn", F.least("mn", "u"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.least("v", "mn").alias("u"), F.greatest("v", "mn").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: direct edges toward the larger endpoint; re-hang each
        # node's SMALLER neighbors (and itself) onto their minimum
        d = large.select(F.col("v").alias("big"), F.col("u").alias("small"))
        mins2 = d.groupBy("big").agg(F.min("small").alias("mn"))
        out = (
            d.join(mins2, "big")
            .select(F.col("small").alias("x"), F.col("mn"))
            .union(mins2.select(F.col("big").alias("x"), F.col("mn")))
        )
        new_edges = (
            out.select(
                F.least("x", "mn").alias("u"), F.greatest("x", "mn").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        new_sig = edge_sig(new_edges)
        edges = new_edges
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # at the fixpoint every non-root node has a direct edge to its component
    # root (the component min); isolated original nodes root themselves
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = sym.groupBy("u").agg(F.min("v").alias("mn")).withColumn(
        "mn", F.least("mn", "u")
    )
    return (
        nodes.join(labels, nodes.node == labels.u, "left")
        .select(
            "node",
            F.coalesce(F.least("mn", "node"), F.col("node")).alias("cluster_id"),
        )
        .select(F.col("node").alias("doc_id"), "cluster_id")
    )


def line_dedup_global(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style corpus-WIDE duplicate-span removal (Raffel et al. 2020 §2.2,
    public: "we discarded all but one of any three-sentence span occurring
    more than once"), at line granularity: every non-empty trimmed line that
    appears anywhere else in the corpus survives only at its FIRST
    occurrence (min (doc_id, position) — deterministic), all later copies
    drop, and each document is re-assembled from its surviving lines.

    Plan: posexplode lines -> ONE window shuffle keyed by line content
    (row_number over (doc_id, pos) picks the canonical copy; map-side
    nothing to combine, but the key is the line so skew == true duplicate
    mass) -> one doc-keyed shuffle to re-assemble.  Linear in corpus size,
    no self-join, no collect.  Returns per-doc summary with the rebuilt
    text's md5 so results stay hashable at any scale."""
    lines = docs.select(
        id_col,
        F.posexplode(
            F.filter(
                F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
                lambda x: x != "",
            )
        ).alias("pos", "line"),
    )
    w = Window.partitionBy("line").orderBy(id_col, "pos")
    ranked = lines.withColumn("__rn", F.row_number().over(w))
    rebuilt = (
        ranked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rn") == 1, F.struct("pos", "line")
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("kept_text"),
        )
    )
    return rebuilt.select(
        id_col,
        "n_lines",
        "n_kept",
        (F.col("n_lines") - F.col("n_kept")).alias("n_dropped"),
        F.md5(F.col("kept_text")).alias("kept_md5"),
    )


def build_exact_index(
    docs: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Persist the exact-dedup fingerprint store: one (content md5 ->
    canonical doc id) row per distinct content, parquet at ``path``.

    This is the INCREMENTAL-dedup layout: at 100 TB you dedup each incoming
    shard against the accumulated store instead of re-mining the whole
    corpus — the store is ~bytes-per-doc tiny relative to the corpus (32-hex
    hash + id), append-only, and mergeable (min canonical id is
    associative).  The same pattern extends to the MinHash band-key store
    (band rows instead of md5 rows); the exact store keeps this operator
    fully oracle-checkable."""
    (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min(F.col(id_col)).alias("canonical_id"))
        .write.mode("overwrite")
        .parquet(path)
    )


def incremental_dedup_against(
    spark,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a new batch against a persisted fingerprint store (see
    build_exact_index): per batch doc -> (verdict, canonical_id).

    'dup_of_store'  — content already in the store (canonical_id = stored id)
    'dup_in_batch'  — new content, but a smaller batch id has the same
                      content (first occurrence in this batch wins)
    'new'           — first sighting anywhere (doc enters the store next
                      merge; canonical_id = own id)

    Plan: ONE md5-keyed window dedups within the batch, then a left join
    against the store on the 32-hex key.  The batch side is the small side
    by construction (a shard vs the world): at 100 TB broadcast the BATCH
    fingerprints, stream the store — Spark's join planning picks that up
    from sizes, no hint needed.  No full-corpus rescan anywhere."""
    store = spark.read.parquet(path)
    w = Window.partitionBy("content_md5").orderBy(id_col)
    b = (
        batch.select(
            F.col(id_col), F.md5(F.col(text_col)).alias("content_md5")
        )
        .withColumn("__rn", F.row_number().over(w))
        # same partition key as __rn -> both window functions share ONE
        # shuffle; this is the within-batch canonical (first occurrence)
        .withColumn(
            "__batch_min",
            F.min(F.col(id_col)).over(Window.partitionBy("content_md5")),
        )
    )
    joined = b.join(store, "content_md5", "left")
    return joined.select(
        F.col(id_col),
        F.col("content_md5"),
        F.when(F.col("canonical_id").isNotNull(), F.lit("dup_of_store"))
        .when(F.col("__rn") > 1, F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
        .alias("verdict"),
        F.coalesce(F.col("canonical_id"), F.col("__batch_min")).alias(
            "canonical_id"
        ),
    )


def keep_best_duplicate(
    docs: DataFrame,
    quality: F.Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-form dedup that keeps the BEST cluster member, not the
    first: documents are clustered on a normalized content key (lowercased,
    punctuation stripped, whitespace collapsed — so case/punct variants of
    the same text cluster together), and within a cluster the member with
    the highest ``quality`` survives (ties: smallest id).  This is how
    production corpus dedup actually chooses survivors — dropping the
    mangled OCR copy and keeping the clean one — versus the min-id
    convention of exact dedup.

    Plan: ONE md5-keyed window (rank by quality desc within cluster); the
    normalization is codegen'd regex work map-side.  Same scale shape as
    exact dedup — one keyed shuffle, no all-pairs anything."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    key = F.md5(norm)
    w = Window.partitionBy("cluster_key").orderBy(
        F.col("__q").desc(), F.col(id_col)
    )
    return (
        docs.withColumn("cluster_key", key)
        .withColumn("__q", quality)
        .withColumn("cluster_size", F.count("*").over(
            Window.partitionBy("cluster_key")))
        .withColumn("__rn", F.row_number().over(w))
        .select(
            F.col(id_col),
            "cluster_key",
            F.col("cluster_size"),
            (F.col("__rn") == 1).alias("kept"),
            F.round(F.col("__q"), 6).alias("quality"),
        )
    )


def edit_distance_neardups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_prefix: int = 12,
    cmp_chars: int = 80,
    len_gap: int = 20,
    neighbor_window: int = 16,
) -> DataFrame:
    """Edit-distance near-dup probe: for every document sharing a
    normalized PREFIX BLOCK with at least one other, the minimum
    Levenshtein distance to a SORTED-NEIGHBORHOOD partner — the nearest
    among the ``neighbor_window`` docs on either side of it in the
    block's (length, content, id) order — and that partner's id.

    Blocking is the scale story, now in the sorted-neighborhood shape
    (Hernández & Stolfo's merge/purge method — public literature): within
    a prefix block (first ``block_prefix`` lowercased chars) members rank
    by (cmp length, cmp, id), and candidate pairs are rank-neighbors
    within ``neighbor_window``.  Candidates per block are then LINEAR in
    block size (≤ 2W each) instead of quadratic — the measured
    10×-dry-run offender of the pure-prefix blocking (PLANS.md §16) — and
    the sort key puts likely-near pairs adjacent (same length, shared
    content prefix).  A ``len_gap`` filter rides along: Levenshtein(a, b)
    >= |len(a) - len(b)|, so a far length gap is a provably far pair
    dropped before the O(len²) verify.

    Distribution: the rank is ONE window per block (narrow rows — id,
    80-char cmp); pairing is a banded equi-join on rank div W with a ±1
    explode on one side (pigeonhole: any |Δrank| <= W pair shares exactly
    one band key), so the join stays an equi-join and no dedup pass is
    needed.  A monster boilerplate block ranks on a single task — narrow
    rows make that a sort of a few MB per million members; past that the
    documented move is widening block_prefix.  The comparison window is
    capped at ``cmp_chars`` chars because Levenshtein is O(len^2) per
    pair — a bounded-cost verify, like the MinHash verify-on-candidates
    step.  Both Spark and DuckDB ship the same classic DP levenshtein —
    and the neighborhood is a deterministic total order — which is what
    keeps this operator fully oracle-checkable."""
    base = (
        docs.select(
            F.col(id_col),
            F.substring(F.lower(F.col(text_col)), 1, block_prefix).alias("blk"),
            F.substring(F.lower(F.col(text_col)), 1, cmp_chars).alias("cmp"),
        )
        .withColumn("lc", F.length("cmp"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("blk").orderBy("lc", "cmp", id_col)
            ),
        )
    )
    rband = (F.col("rk") / neighbor_window).cast("long")
    a = base.select(
        F.col(id_col).alias("a_id"),
        "blk",
        F.col("cmp").alias("a_cmp"),
        F.col("lc").alias("a_lc"),
        F.col("rk").alias("a_rk"),
        F.explode(F.array(rband - 1, rband, rband + 1)).alias("jband"),
    )
    b = base.select(
        F.col(id_col).alias("b_id"),
        "blk",
        F.col("cmp").alias("b_cmp"),
        F.col("lc").alias("b_lc"),
        F.col("rk").alias("b_rk"),
        rband.alias("jband"),
    )
    pairs = a.join(b, ["blk", "jband"]).filter(
        (F.col("a_id") != F.col("b_id"))
        & (F.abs(F.col("a_rk") - F.col("b_rk")) <= neighbor_window)
        & (F.abs(F.col("a_lc") - F.col("b_lc")) <= len_gap)
    )
    # the join output inherits the BLOCK partitioning, so a monster block
    # would run every Levenshtein on one task; re-hashing the (narrow)
    # candidate pairs on a_id parallelizes the O(len²) verify AND is the
    # exact partitioning the nearest-partner window needs — one shuffle,
    # zero extra exchanges (measured: 53 s -> seconds on a single-block
    # 50k worst case, PLANS.md §16)
    scored = pairs.repartition(F.col("a_id")).withColumn(
        "dist", F.levenshtein(F.col("a_cmp"), F.col("b_cmp"))
    )
    w = Window.partitionBy("a_id").orderBy("dist", "b_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("a_id").alias(id_col),
            F.col("b_id").alias("nn_id"),
            F.col("dist").alias("nn_dist"),
        )
    )
