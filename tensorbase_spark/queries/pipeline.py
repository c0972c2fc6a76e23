"""Driver-facing queries for the training-data pipeline operators
(tensorbase_spark.pipeline.*): dedup, similarity search, text analysis,
multimodal plumbing.

Exact/deterministic operators carry a DuckDB oracle that mirrors the Spark
logic expression-for-expression.  Approximate operators (MinHash LSH,
SimHash, IVF) have no SQL oracle — the driver records a rows-only check and
tests/test_pipeline.py bounds their error against the exact baselines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tensorbase_spark.pipeline import dedup, multimodal, sampling, similarity, text
from tensorbase_spark.queries import Query
from tensorbase_spark.sources.tables import (
    load_table,
    parquet_array_dim,
    parquet_num_rows,
)


# --- deduplication ----------------------------------------------------------

def dedup_exact(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_duplicates(d)


DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS content_hash, count(*) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keep_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1
"""


def dedup_stats_by_source(spark, sf_dir):
    """Per-source duplication profile — non-empty even on dup-free fixtures,
    so the oracle check always verifies real values."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("text").alias("n_distinct_texts"),
            (F.count("*") - F.countDistinct("text")).alias("n_dup_docs"),
        )
    )


DEDUP_STATS_ORACLE = """
SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_distinct_texts,
       count(*) - count(DISTINCT text) AS n_dup_docs
FROM documents GROUP BY source
"""


def dedup_incremental_index(spark, sf_dir):
    """Incremental dedup against a PERSISTED fingerprint store — the 100 TB
    operational shape: the corpus's (content md5 -> canonical id) store is
    built once (here from the doc_id % 5 != 0 'historical' docs), written to
    parquet, and each incoming shard (doc_id % 5 == 0) is verdicted against
    it with one batch-keyed window + one store join — no full-corpus
    re-scan.  Fully deterministic -> full DuckDB oracle."""
    import os

    d = load_table(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    path = f"/tmp/tbs_exact_index/{os.path.basename(sf_dir.rstrip('/'))}"
    dedup.build_exact_index(hist, path)
    return dedup.incremental_dedup_against(spark, path, batch)


DEDUP_INCREMENTAL_ORACLE = """
WITH store AS (
  SELECT md5(text) AS content_md5, min(doc_id) AS canonical_id
  FROM documents WHERE doc_id % 5 <> 0 GROUP BY md5(text)
),
b AS (
  SELECT doc_id, md5(text) AS content_md5,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
         min(doc_id) OVER (PARTITION BY md5(text)) AS batch_min
  FROM documents WHERE doc_id % 5 = 0
)
SELECT b.doc_id, b.content_md5,
       CASE WHEN s.canonical_id IS NOT NULL THEN 'dup_of_store'
            WHEN b.rn > 1 THEN 'dup_in_batch'
            ELSE 'new' END AS verdict,
       CAST(COALESCE(s.canonical_id, b.batch_min) AS BIGINT) AS canonical_id
FROM b LEFT JOIN store s USING (content_md5)
"""


def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs (approximate candidate gen, exact-Jaccard
    verified).  No SQL oracle; recall vs the exact bigram-Jaccard op is
    asserted in tests."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, threshold=0.8)


def dedup_simhash(spark, sf_dir):
    """SimHash fingerprint near-pairs at hamming<=3 (approximate)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(d, max_hamming=3)


def dedup_ngram_jaccard(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # footer row count drives the cost-based gram-order choice (demotion
    # pays above ~20k docs; identical results either way)
    return dedup.ngram_jaccard_pairs(
        d, threshold=0.6, n_docs=parquet_num_rows(sf_dir, "documents")
    )


NGRAM_JACCARD_ORACLE = """
WITH base AS (
  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents
), d AS (
  SELECT doc_id, lang, n_chars,
         CASE WHEN len(w) >= 2 THEN
           list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
         ELSE [] END AS bg
  FROM base
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE)
             / len(list_distinct(list_concat(a.bg, b.bg))), 6) AS jaccard
FROM d a JOIN d b
  ON a.lang = b.lang AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
WHERE CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE)
      / len(list_distinct(list_concat(a.bg, b.bg))) >= 0.6
"""


# --- similarity search ------------------------------------------------------

def _emb_queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, emb.filter(F.col("vec_id") % 100 == 0)


def sim_brute_force_topk(spark, sf_dir):
    emb, q = _emb_queries(spark, sf_dir)
    # n from the parquet footer sizes the corpus-scan spread (r15)
    return similarity.brute_force_topk(emb, q, k=5, n=parquet_num_rows(sf_dir, "embeddings"))


_COS = (
    "list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),"
    " list_transform({b}, x -> CAST(x AS DOUBLE)))"
)

SIM_BRUTE_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id % 100 = 0
), c AS (
  SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
), scored AS (
  SELECT q_id, c_id,
         {_COS.format(a="q_vec", b="c_vec")}
         / (sqrt({_COS.format(a="q_vec", b="q_vec")})
            * sqrt({_COS.format(a="c_vec", b="c_vec")})) AS cos
  FROM c, q WHERE q_id <> c_id
), ranked AS (
  SELECT q_id, c_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS INT) AS rank
  FROM scored
)
SELECT q_id, c_id, rank, round(cos, 6) AS cos FROM ranked WHERE rank <= 5
"""


def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs via the BUCKETED path (multi-probe
    k-means buckets, equi-join on centroid_id, cosine on candidates only —
    never all-pairs), checked against the all-pairs DuckDB oracle: on the
    fixtures the bucketed candidate set loses no qualifying pair, so the
    hash must match exactly.  The synthetic fixture embeddings are
    near-orthogonal (max pairwise cos ~0.51), so the fixture threshold sits
    in the upper tail to verify real values; a production near-dup run would
    use ~0.95 (where fewer probes suffice)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # corpus size from the parquet footer (catalog-stats stand-in): the
    # centroid auto-scaling needs n, and passing it deletes the r7 sizing
    # count job (the +35% bench regression attributed in PLANS.md)
    return similarity.embedding_near_dup_pairs(
        emb, threshold=0.4, n=parquet_num_rows(sf_dir, "embeddings")
    )


DEDUP_EMB_ORACLE = f"""
WITH a AS (
  SELECT vec_id AS id_a, embedding AS vec_a FROM embeddings
), b AS (
  SELECT vec_id AS id_b, embedding AS vec_b FROM embeddings
), scored AS (
  SELECT id_a, id_b,
         {_COS.format(a="vec_a", b="vec_b")}
         / (sqrt({_COS.format(a="vec_a", b="vec_a")})
            * sqrt({_COS.format(a="vec_b", b="vec_b")})) AS cos
  FROM a, b WHERE id_a < id_b
)
SELECT id_a, id_b, round(cos, 6) AS cos FROM scored WHERE cos >= 0.4
"""


def sim_ivf_topk(spark, sf_dir):
    """IVF/LSH-bucketed ANN — the 100 TB scale path (probe nprobe buckets
    instead of the corpus).  Approximate: rows-only check; recall vs brute
    force asserted in tests."""
    emb, q = _emb_queries(spark, sf_dir)
    # n_centroids auto-scales from the footer row count (floor 16 == the
    # historical fixture layout, and 2000/128 -> exactly 16 at sf0.1, so
    # every fixture keeps its r7 bucket layout); the count job is skipped
    # via n.  target_bucket=128 holds per-query candidate volume constant
    # from sf0.1 upward (the r7 sweep watch-item).
    return similarity.ivf_topk(
        emb, q, k=5, nprobe=4, n=parquet_num_rows(sf_dir, "embeddings"),
        target_bucket=128,
    )


def _index_stamp(sf_dir: str, params: str) -> str:
    """Source identity (mtime_ns:size — directory layouts sum over parts)
    + the BUILD PARAMETERS: an index built with a different nlist/codebook
    must rebuild even when the source parquet is unchanged (r8 review —
    the footer-sized nlist change would otherwise silently keep searching
    a stale fixed-16 index)."""
    import os

    src = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(src):
        sts = [
            os.stat(os.path.join(src, f))
            for f in sorted(os.listdir(src))
            if f.endswith(".parquet")
        ]
        ident = ";".join(f"{st.st_mtime_ns}:{st.st_size}" for st in sts)
    else:
        st = os.stat(src)
        ident = f"{st.st_mtime_ns}:{st.st_size}"
    return f"{ident}|{params}"


def _index_is_current(idx: str, sf_dir: str, params: str = "") -> bool:
    """True when ``idx`` was built from the CURRENT embeddings parquet with
    the SAME build parameters."""
    import os

    marker = os.path.join(idx, "_SOURCE_STAMP")
    try:
        with open(marker) as f:
            return f.read().strip() == _index_stamp(sf_dir, params)
    except OSError:
        return False


def _write_index_stamp(idx: str, sf_dir: str, params: str = "") -> None:
    import os

    with open(os.path.join(idx, "_SOURCE_STAMP"), "w") as f:
        f.write(_index_stamp(sf_dir, params))


def sim_ivf_indexed(spark, sf_dir):
    """Persistent IVF index: build (parquet partitioned by centroid_id) then
    search with directory-level partition pruning — identical results to the
    in-memory IVF (asserted in tests), but the scan reads only the probed
    buckets (PartitionFilters in the plan).

    The build is skipped when the index on disk was derived from the current
    embeddings parquet (source-stamped marker) — so repeated invocations
    time the steady-state SEARCH path, which is the number that matters for
    a persisted index (bench best-of-3: run 1 may pay the build, runs 2-3
    are search-only)."""
    import os

    emb, q = _emb_queries(spark, sf_dir)
    idx = f"/tmp/tbs_ivf_index/{os.path.basename(sf_dir.rstrip('/'))}"
    nlist = similarity.auto_n_centroids(
        parquet_num_rows(sf_dir, "embeddings"), 128
    )
    if not _index_is_current(idx, sf_dir, f"nlist={nlist}"):
        # nlist is a BUILD parameter (the scale-safe place for it): sized
        # from the footer row count with the same bucket-constant rule as
        # the in-memory paths — fixtures and sf0.1 keep the historical 16
        similarity.build_ivf_index(emb, idx, n_centroids=nlist, n=parquet_num_rows(sf_dir, "embeddings"))
        _write_index_stamp(idx, sf_dir, f"nlist={nlist}")
    return similarity.ivf_search_indexed(spark, idx, q, k=5, nprobe=4)


def sim_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed ANN (the training-free alternative to IVF: deterministic
    random hyperplanes, one bucket per hash table, candidates from an
    equi-join on (table, bucket)).  Approximate: rows-only check; recall vs
    brute force asserted in tests."""
    emb, q = _emb_queries(spark, sf_dir)
    # MULTI-PROBE (r9, VERDICT r8 #4): narrower buckets (auto width now
    # counts n x probes against target_bucket) + each query probing its 4
    # smallest-margin bit-flip buckets per table.  Per-query candidate
    # volume stays ~probes x n / 2^bits ~ 128 per table at every sf, but
    # recall per candidate improves vs widening buckets: measured at
    # sf0.1 recall 0.97 (was 0.90) at 0.93 s (was 1.5-1.7 s); sf1 1.86 s,
    # sf10 6.1 s = 6.6x wall at 100x data (PLANS §22).
    return similarity.lsh_topk(
        emb, q, k=5, n_tables=16, min_bits=4, probes=4,
        n=parquet_num_rows(sf_dir, "embeddings"), target_bucket=128,
        # embedding width from the parquet footer (catalog-schema stand-in)
        # — deletes the per-run first() probe job (r14)
        dim=parquet_array_dim(sf_dir, "embeddings", "embedding"),
    )


def sim_ivf_full_probe(spark, sf_dir):
    """Driver-evidence companion for the IVF path (r2 verdict #5): with
    nprobe = n_centroids every bucket is probed, so the ENTIRE IVF machinery
    (deterministic k-means training, centroid assignment, probe equi-join,
    candidate ranking) must reproduce the exact brute-force top-k — which is
    what the SQL oracle computes.  The hash row proves the bucketed plumbing
    loses nothing when coverage is total; recall at partial nprobe stays
    asserted in tests/test_pipeline.py."""
    emb, q = _emb_queries(spark, sf_dir)
    return similarity.ivf_topk(
        emb, q, k=5, n_centroids=8, nprobe=8,
        n=parquet_num_rows(sf_dir, "embeddings"),
    )


def sim_pq_topk(spark, sf_dir):
    """Product-quantization ANN (pipeline/similarity.py pq_topk — FAISS
    PQ+refine shape): corpus encoded once to m=8 one-byte codes (64x smaller
    than the float64 vectors), ADC scan via per-query lookup tables, exact
    re-rank on k*cand_mult candidates.  Approximate: rows-only check; recall
    vs brute force asserted in tests."""
    emb, q = _emb_queries(spark, sf_dir)
    return similarity.pq_topk(emb, q, k=5, n=parquet_num_rows(sf_dir, "embeddings"))


def sim_pq_rerank_full(spark, sf_dir):
    """Driver-evidence companion for the PQ path: with cand_mult covering
    the whole corpus the ADC stage keeps every row, so the exact re-rank
    must reproduce brute-force top-k regardless of codebook quality — the
    SQL oracle.  The hash row proves the full PQ pipeline (deterministic
    codebook training, Arrow encode, LUT ADC scan, candidate cut, re-rank
    joins) loses nothing when coverage is total; recall at the production
    cand_mult stays in tests/test_pipeline.py."""
    emb, q = _emb_queries(spark, sf_dir)
    return similarity.pq_topk(emb, q, k=5, cand_mult=10**7, n=parquet_num_rows(sf_dir, "embeddings"))


def embedding_l2_normalize(spark, sf_dir):
    """Unit-normalization as pure JVM HOFs (similarity.l2_normalize) —
    zero Python, zero shuffle, the standard cosine pre-pass.  The unit
    vector is serialized to a CSV string of 1e6-scaled integers for the
    driver hash (raw ARRAY cells are unhashable in its pandas
    canonicalizer; integer rendering is engine-identical)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.l2_normalize(emb)
    return out.select(
        "vec_id",
        "norm",
        F.concat_ws(
            ",",
            F.transform(
                "unit_vec",
                lambda x: F.round(x * 1000000).cast("long").cast("string"),
            ),
        ).alias("unit_vec"),
    )


_EMB_DBL = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

EMB_L2_ORACLE = f"""
WITH d AS (SELECT vec_id, {_EMB_DBL} AS v FROM embeddings)
SELECT vec_id,
       round(sqrt(list_dot_product(v, v)), 6) AS norm,
       array_to_string(list_transform(v,
           x -> CAST(round(round(x / greatest(sqrt(list_dot_product(v, v)),
                                              1e-300), 6) * 1000000)
                     AS BIGINT)), ',') AS unit_vec
FROM d
"""


def embedding_mean_pool(spark, sf_dir):
    """Per-label centroid pooling (similarity.mean_pool): posexplode ->
    (group, position) partial averages -> sorted re-assembly.  Both shuffles
    are map-side combined and bounded by groups x dim, not corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.mean_pool(emb, "label")
    # serialize the centroid to 1e6-scaled integers for the driver hash
    return out.select(
        "label",
        "n_vecs",
        F.concat_ws(
            ",",
            F.transform(
                "mean_vec",
                lambda x: F.round(x * 1000000).cast("long").cast("string"),
            ),
        ).alias("mean_vec"),
    )


EMB_MEAN_POOL_ORACLE = """
WITH pos AS (
  SELECT label, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS m,
         count(*) AS n
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
  GROUP BY label, i
)
SELECT label, max(n) AS n_vecs,
       array_to_string(list_transform(list_sort(list(struct_pack(pos := pos,
                                                                 m := m))),
           s -> CAST(round(round(s.m, 6) * 1000000) AS BIGINT)), ',') AS mean_vec
FROM pos GROUP BY label
"""


def embedding_pca_variance(spark, sf_dir):
    """Cross-engine check of the DISTRIBUTED moment computation behind PCA
    (similarity._pca_moments_np): the sum of ALL eigenvalues of the
    population covariance equals the total per-coordinate variance, which
    the DuckDB oracle computes element-wise from the raw vectors.  A hash
    match proves the partition-partial (n, Σx, XᵀX) reduction is exact.
    The eigh/projection side (orthonormality, reconstruction, sign
    stability) is asserted in tests/test_pipeline.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    _mean, _comps, vals = similarity.pca_train(emb, k=dim)
    return spark.createDataFrame(
        [(float(round(vals.sum(), 6)),)], "total_var: double"
    )


EMB_PCA_VAR_ORACLE = """
SELECT round(sum(v), 6) AS total_var FROM (
  SELECT var_pop(CAST(embedding[i] AS DOUBLE)) AS v
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
  GROUP BY i
)
"""


def sim_ivfpq_topk(spark, sf_dir):
    """IVF-PQ combined index (similarity.ivfpq_topk — FAISS IVFPQ shape):
    coarse buckets prune to nprobe/nlist of the corpus, residual PQ
    compresses the rest to m bytes/vector, per-bucket ADC, exact re-rank.
    Approximate: rows-only; recall + full-cover equivalence in tests."""
    emb, q = _emb_queries(spark, sf_dir)
    return similarity.ivfpq_topk(
        emb, q, k=5, n_centroids=16, nprobe=8, n=parquet_num_rows(sf_dir, "embeddings")
    )


def sim_ivfpq_full_cover(spark, sf_dir):
    """Driver-evidence companion for IVF-PQ: probing every bucket with an
    unbounded candidate cut makes the exact re-rank reproduce brute-force
    top-k — the SQL oracle — regardless of quantization quality.  The hash
    row proves the whole encode→probe→ADC→re-rank pipeline loses nothing at
    full coverage."""
    emb, q = _emb_queries(spark, sf_dir)
    return similarity.ivfpq_topk(
        emb, q, k=5, n_centroids=16, nprobe=16, cand_mult=10**6, n=parquet_num_rows(sf_dir, "embeddings")
    )


def sim_ivfpq_indexed(spark, sf_dir):
    """Persistent IVF-PQ index (similarity.build_ivfpq_index): m-byte codes
    parquet PARTITIONED BY centroid_id + centroid/codebook side tables; a
    probe directory-prunes the codes scan (PartitionFilters asserted in
    tests) and returns results identical to the in-memory path."""
    import os

    emb, q = _emb_queries(spark, sf_dir)
    idx = f"/tmp/tbs_ivfpq_index/{os.path.basename(sf_dir.rstrip('/'))}"
    # build-once behind a source stamp, like sim_ivf_indexed: repeated
    # invocations time the steady-state search (probe + ADC + re-rank)
    if not _index_is_current(idx, sf_dir, "nlist=16"):
        similarity.build_ivfpq_index(emb, idx, n_centroids=16, n=parquet_num_rows(sf_dir, "embeddings"))
        _write_index_stamp(idx, sf_dir, "nlist=16")
    return similarity.ivfpq_search_indexed(spark, idx, emb, q, k=5, nprobe=8)


def sim_lsh_full_cover(spark, sf_dir):
    """Driver-evidence companion for the sign-LSH path: with n_bits=0 every
    vector lands in the single bucket of the single table, so the LSH
    plumbing (hyperplane pandas UDF, posexplode bucketing, (table, bucket)
    equi-join, candidate dedup, ranking) must reproduce exact brute-force
    top-k — the SQL oracle.  Recall at real bit-widths stays in tests."""
    emb, q = _emb_queries(spark, sf_dir)
    return similarity.lsh_topk(emb, q, k=5, n_bits=0, n_tables=1)


_WORDS_EXPR = "array_distinct(filter(split(lower(text), '[^a-z0-9]+'), w -> w != ''))"


def dedup_minhash_bands_sql(spark, sf_dir):
    """Driver-evidence companion for the MinHash-LSH family: a REAL min-wise
    hashing scheme (8 independent salted permutations; permutation b ranks a
    word by md5(b || ':' || word)) whose hash function both engines share —
    so candidate generation AND the exact-Jaccard verify are deterministic
    and the DuckDB oracle mirrors them end to end.  The production operator
    (pipeline/dedup.py minhash_lsh_pairs) keeps its xxhash-vectorized
    signatures and rows-only check; this row proves the band-join topology
    (band equi-join -> pair dedup -> verify-on-candidates) cross-engine.

    Scale shape: same as the production op — one pass for signatures, an
    equi-join on (band, sig), and the verify join rejoins words by doc_id so
    word arrays never ride through the band shuffle."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.expr(_WORDS_EXPR).alias("words"))
    bands = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("band"),
        "words",
    ).select(
        "doc_id",
        "band",
        F.expr(
            "array_min(transform(words, w -> md5(concat(cast(band as string), ':', w))))"
        ).alias("sig"),
    )
    a = bands.select(F.col("doc_id").alias("id_a"), "band", "sig")
    b = bands.select(F.col("doc_id").alias("id_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    wa = docs.select(F.col("doc_id").alias("id_a"), F.col("words").alias("w_a"))
    wb = docs.select(F.col("doc_id").alias("id_b"), F.col("words").alias("w_b"))
    verified = (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("w_a", "w_b")).cast("double")
                / F.size(F.array_union("w_a", "w_b")),
                6,
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= 0.95).select("id_a", "id_b", "jaccard")


_WORDS_SQL = (
    "list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " w -> w <> ''))"
)

MINHASH_BANDS_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_WORDS_SQL} AS words FROM documents
), sigs AS (
  SELECT doc_id, band,
         list_min(list_transform(words,
                  w -> md5(CAST(band AS VARCHAR) || ':' || w))) AS sig
  FROM d CROSS JOIN range(8) t(band)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sigs a JOIN sigs b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), verified AS (
  SELECT cand.id_a, cand.id_b,
         round(CAST(len(list_intersect(da.words, db.words)) AS DOUBLE)
               / len(list_distinct(list_concat(da.words, db.words))), 6) AS jaccard
  FROM cand
  JOIN d da ON cand.id_a = da.doc_id
  JOIN d db ON cand.id_b = db.doc_id
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.95
"""


def dedup_simhash_fp_sql(spark, sf_dir):
    """Driver-evidence companion for the SimHash family: a 16-bit simhash
    whose per-word bit source is shared by both engines — bit i of a word is
    ascii(hex digit i of md5(word)) mod 2, the fingerprint bit is the sign
    of the +1/-1 vote sum over the doc's distinct words.  Deterministic in
    both engines, so the per-doc fingerprint gets a hash row; the production
    64-bit xxhash operator (dedup.simhash_near_pairs) keeps its rows-only
    check + pytest hamming bounds.

    Shape: explode(words) x explode(16 bits) -> two hash aggregations —
    shuffle rows ∝ 16 x total words, the same partial/final agg topology the
    production signature pass uses."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.expr(_WORDS_EXPR).alias("words"))
    votes = (
        docs.select("doc_id", F.explode("words").alias("word"))
        .select("doc_id", "word", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("i"))
        .groupBy("doc_id", "i")
        .agg(
            F.sum(
                F.expr("(ascii(substring(md5(word), i + 1, 1)) % 2) * 2 - 1")
            ).alias("vote")
        )
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.expr("case when vote > 0 then shiftleft(1L, i) else 0L end")
            ).alias("fp16")
        )
        .select("doc_id", "fp16")
    )


SIMHASH_FP_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_WORDS_SQL} AS words FROM documents
), w AS (
  SELECT doc_id, unnest(words) AS word FROM d
), votes AS (
  SELECT doc_id, i,
         sum((ascii(substr(md5(word), i + 1, 1)) % 2) * 2 - 1) AS vote
  FROM w CROSS JOIN range(16) t(i)
  GROUP BY doc_id, i
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS fp16
FROM votes GROUP BY doc_id
"""


def sim_knn_classify(spark, sf_dir):
    emb, q = _emb_queries(spark, sf_dir)
    return similarity.label_knn_classify(emb, q, k=10, n=parquet_num_rows(sf_dir, "embeddings"))


SIM_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id % 100 = 0
), c AS (
  SELECT vec_id AS c_id, embedding AS c_vec, label AS c_label FROM embeddings
), scored AS (
  SELECT q_id, c_id, c_label,
         {_COS.format(a="q_vec", b="c_vec")}
         / (sqrt({_COS.format(a="q_vec", b="q_vec")})
            * sqrt({_COS.format(a="c_vec", b="c_vec")})) AS cos
  FROM c, q WHERE q_id <> c_id
), top AS (
  SELECT q_id, c_label FROM (
    SELECT q_id, c_label, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk
    FROM scored
  ) WHERE rnk <= 10
), votes AS (
  SELECT q_id, c_label, count(*) AS votes FROM top GROUP BY q_id, c_label
)
SELECT q_id, c_label AS pred_label, votes FROM (
  SELECT q_id, c_label, votes,
         row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, c_label) AS rn
  FROM votes
) WHERE rn = 1
"""


# --- text analysis ----------------------------------------------------------

def text_token_counts(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return text.token_counts(d)


TOKEN_COUNTS_ORACLE = r"""
SELECT doc_id,
       CAST(length(text) AS INT)                                   AS n_chars_obs,
       CAST(len(regexp_extract_all(text, '\S+')) AS INT)           AS n_words,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT)   AS n_tokens,
       CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS INT) AS n_unique_words
FROM documents
"""


def text_quality_scores(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return text.quality_scores(d)


_STOPS_SQL = "['the','a','of','and','is','to','in','that']"

QUALITY_ORACLE = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_words,
         CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS DOUBLE) AS uniq,
         CAST(len(list_intersect(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> '')),
                                 {_STOPS_SQL})) AS DOUBLE) AS stop_hits
  FROM documents
)
SELECT doc_id,
       round(least(1.0, n_words / 100.0), 6)                       AS length_factor,
       round(uniq / greatest(n_words, 1.0), 6)                     AS diversity,
       round(least(1.0, stop_hits / 3.0), 6)                       AS stop_factor,
       round(0.4 * least(1.0, n_words / 100.0)
             + 0.3 * (uniq / greatest(n_words, 1.0))
             + 0.3 * least(1.0, stop_hits / 3.0), 6)               AS quality
FROM t
"""


def text_lang_id(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return text.lang_id(d)


_PROFILE_SQL = {
    "de": "['der','die','das','und','ist','nicht','ein','mit']",
    "en": "['the','a','of','and','is','to','in','that']",
    "es": "['el','la','de','que','y','en','un','es']",
    "fr": "['le','la','de','et','un','est','que','en']",
    "zh": "['de','shi','le','bu','wo','you','he','ren']",
}

LANG_ID_ORACLE = rf"""
WITH w AS (
  SELECT doc_id, lang, list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS ws
  FROM documents
), s AS (
  SELECT doc_id, lang,
         CAST(len(list_intersect(ws, {_PROFILE_SQL['de']})) AS INT) AS s_de,
         CAST(len(list_intersect(ws, {_PROFILE_SQL['en']})) AS INT) AS s_en,
         CAST(len(list_intersect(ws, {_PROFILE_SQL['es']})) AS INT) AS s_es,
         CAST(len(list_intersect(ws, {_PROFILE_SQL['fr']})) AS INT) AS s_fr,
         CAST(len(list_intersect(ws, {_PROFILE_SQL['zh']})) AS INT) AS s_zh
  FROM w
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
            WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
            WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
            WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
            ELSE 'zh' END AS pred_lang,
       greatest(s_de, s_en, s_es, s_fr, s_zh) AS pred_hits
FROM s
"""


def text_unigram_logprob(spark, sf_dir):
    """Corpus-unigram-LM scoring (pipeline/text.py unigram_logprob): vocab
    built once over the corpus (shuffle bounded by vocabulary size), token
    stream joins it broadcast, per-doc avg ln p(token).  Slice keeps the
    driver compare small; vocab is still built over ALL documents."""
    d = load_table(spark, sf_dir, "documents")
    return text.unigram_logprob(d).filter(F.col("doc_id") < 200)


UNIGRAM_LOGPROB_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS u(tok)
),
vocab AS (SELECT tok, count(*) AS tok_n FROM toks GROUP BY tok),
total AS (SELECT sum(tok_n) AS corpus_n FROM vocab)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(ln(tok_n / corpus_n)), 4) AS avg_logprob
FROM toks JOIN vocab USING (tok), total
WHERE doc_id < 200
GROUP BY doc_id
"""


def text_repetition_filters(spark, sf_dir):
    """Gopher repetition filters (pipeline/text.py repetition_scores): line
    metrics are shuffle-free JVM HOFs; the top-2-gram mode is one
    (doc_id, gram)-keyed shuffle with map-side combine."""
    d = load_table(spark, sf_dir, "documents")
    return text.repetition_scores(d)


TEXT_REPETITION_ORACLE = r"""
WITH l AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                     x -> x <> '') AS lines,
         list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                     x -> x <> '') AS ws
  FROM documents
), m AS (
  SELECT doc_id, len(lines) AS n_lines,
         CASE WHEN len(lines) > 0
              THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
              ELSE 0.0 END AS dlf,
         CASE WHEN coalesce(list_sum(list_transform(lines, x -> length(x))), 0) > 0
              THEN CAST(coalesce(list_sum(list_transform(
                       list_filter(lines, x -> len(list_filter(lines, y -> y = x)) > 1),
                       x -> length(x))), 0) AS DOUBLE)
                   / list_sum(list_transform(lines, x -> length(x)))
              ELSE 0.0 END AS dlcf,
         CASE WHEN len(ws) >= 2
              THEN list_transform(generate_series(1, len(ws) - 1),
                                  i -> ws[i] || ' ' || ws[i + 1])
              ELSE [] END AS bgs
  FROM l
), bg AS (
  SELECT doc_id, g, count(*) AS c FROM m, UNNEST(bgs) AS u(g) GROUP BY doc_id, g
), top AS (
  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS tbf FROM bg GROUP BY doc_id
)
SELECT m.doc_id, CAST(n_lines AS INT) AS n_lines,
       round(dlf, 6)                   AS dup_line_frac,
       round(dlcf, 6)                  AS dup_line_char_frac,
       round(coalesce(tbf, 0.0), 6)    AS top_bigram_frac,
       (dlf > 0.3 OR coalesce(tbf, 0.0) > 0.18) AS is_repetitive
FROM m LEFT JOIN top ON m.doc_id = top.doc_id
"""


def dedup_lines_global(spark, sf_dir):
    """C4-style corpus-wide duplicate-line removal (pipeline/dedup.py
    line_dedup_global): one line-keyed window shuffle + one doc-keyed
    re-assembly shuffle, linear in corpus size."""
    from tensorbase_spark.pipeline import dedup

    d = load_table(spark, sf_dir, "documents")
    return dedup.line_dedup_global(d)


DEDUP_LINES_GLOBAL_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                     x -> x <> '') AS ls
  FROM documents
), lines AS (
  SELECT doc_id, i AS pos, ls[i] AS line
  FROM d, UNNEST(generate_series(1, len(ls))) AS t(i)
), ranked AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM lines
)
SELECT doc_id,
       count(*) AS n_lines,
       count(*) FILTER (WHERE rn = 1) AS n_kept,
       count(*) - count(*) FILTER (WHERE rn = 1) AS n_dropped,
       md5(coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE rn = 1),
                    '')) AS kept_md5
FROM ranked GROUP BY doc_id
"""


def text_bpe_tokenize(spark, sf_dir):
    """Real BPE (pipeline/text.py): merges trained on the bounded
    hash-ordered sample driver-side, broadcast via closure, one
    Arrow-batched encode pass with a per-worker word cache.  Rows-only by
    nature (no SQL engine can replay BPE); determinism + golden merges
    asserted in tests/test_pipeline.py."""
    d = load_table(spark, sf_dir, "documents")
    merges = text.train_bpe_merges(d, n_merges=200)
    return text.bpe_token_counts(d, merges)


def text_bpe_merges_check(spark, sf_dir):
    """Hash-verified companion for the BPE path: the same Arrow-batched
    greedy encoder (pipeline/text.py bpe_token_counts — rank scan, symbol
    merge loop, per-worker word cache) is run with a FIXED merge table whose
    pairs are character-disjoint: ('t','h'), ('a','n'), ('o','u'),
    ('e','</w>').  With disjoint pairs of distinct symbols, greedy
    rank-ordered application collapses to independent non-overlapping
    pair counting, so per word
    ``n_tokens = len(w) + 1 - #th - #an - #ou - endswith('e')``
    — a closed form DuckDB evaluates exactly.  The trained-merges form
    (text_bpe_tokenize) stays rows-only; this row proves the encoder."""
    fixed = [("t", "h"), ("a", "n"), ("o", "u"), ("e", "</w>")]
    d = load_table(spark, sf_dir, "documents")
    out = text.bpe_token_counts(d, fixed)
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )


BPE_MERGES_CHECK_ORACLE = """
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
per_word AS (
  SELECT doc_id,
         len(w) + 1
           - (len(w) - len(replace(w, 'th', ''))) // 2
           - (len(w) - len(replace(w, 'an', ''))) // 2
           - (len(w) - len(replace(w, 'ou', ''))) // 2
           - CASE WHEN w LIKE '%e' THEN 1 ELSE 0 END AS toks
  FROM words
)
SELECT d.doc_id,
       CAST(count(p.toks) AS BIGINT)              AS n_words,
       CAST(coalesce(sum(p.toks), 0) AS BIGINT)   AS n_bpe_tokens
FROM documents d LEFT JOIN per_word p USING (doc_id)
GROUP BY d.doc_id
"""


def text_fingerprints(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return text.fingerprints(d)


FINGERPRINT_ORACLE = """
SELECT doc_id, md5(text) AS content_md5,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, least(length(text), 64) + 1),
                          i -> CAST(unicode(text[i]) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 2147483647) AS rolling_hash
FROM documents
"""


# --- multimodal plumbing ----------------------------------------------------

def multimodal_features(spark, sf_dir):
    """Binary-column feature extraction through the Arrow/mapInPandas path.
    The container-header decode is REAL (stdlib struct parse); the text
    fixture payloads are not images, so format='bin' and dimensions are
    honest NULLs — never fabricated (multimodal_png_decode covers the
    image-bytes path with synthesized real PNGs)."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.docs_as_assets(d))


MULTIMODAL_ORACLE = """
SELECT doc_id AS asset_id,
       CAST(octet_length(encode(text)) AS INT)          AS n_bytes,
       'bin'                                            AS format,
       lower(hex(encode(substring(text, 1, 8))))        AS header_hex,
       CAST(NULL AS INT)                                AS width,
       CAST(NULL AS INT)                                AS height,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(text) + 1),
                          i -> CAST(unicode(text[i]) AS BIGINT))),
         (acc, x) -> acc + x) % 2147483648 AS checksum
FROM documents
"""


def multimodal_png_decode(spark, sf_dir):
    """REAL image decode round-trip: synthesize a valid grayscale PNG per
    document (stdlib zlib/struct encoder, dims derived from doc_id, pixels
    from the doc id so every payload is distinct), then recover
    width/height/format by parsing the actual PNG bytes back.  The oracle
    recomputes the expected dims from doc_id arithmetic — the hash can only
    match if the byte-level encode->decode round-trip is faithful."""
    from collections.abc import Iterator

    import pandas as pd

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    assets = d.select(F.col("doc_id").alias("asset_id"))

    def _synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids = pdf["asset_id"]
            payloads = [
                multimodal.encode_png(
                    int(i) % 31 + 1,
                    (int(i) * 3) % 29 + 1,
                    lambda x, y, i=int(i): (x * 7 + y * 13 + i) & 0xFF,
                )
                for i in ids
            ]
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    from pyspark.sql import types as T

    png_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    pngs = assets.mapInPandas(_synth, png_schema)
    feats = multimodal.extract_features(pngs)
    return feats.select("asset_id", "format", "width", "height")


MULTIMODAL_PNG_ORACLE = """
SELECT doc_id AS asset_id, 'png' AS format,
       CAST(doc_id % 31 + 1 AS INT) AS width,
       CAST((doc_id * 3) % 29 + 1 AS INT) AS height
FROM documents WHERE doc_id % 5 = 0
"""


def multimodal_wav_decode(spark, sf_dir):
    """REAL audio decode round-trip: synthesize a valid PCM16 WAV per
    document (stdlib struct encoder; sample count + rate derived from
    doc_id), parse the RIFF/fmt/data chunks back from the actual bytes.
    Oracle recomputes rate/frame-count from doc_id arithmetic — hash
    matches only if the byte-level round trip is faithful."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    assets = d.select(F.col("doc_id").alias("asset_id"))

    def _synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids = pdf["asset_id"]
            payloads = [
                multimodal.encode_wav(
                    int(i) % 400 + 100, 8000 * (int(i) % 3 + 1)
                )
                for i in ids
            ]
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    wav_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    wavs = assets.mapInPandas(_synth, wav_schema)

    meta_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("format", T.StringType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("bits", T.IntegerType(), True),
            T.StructField("n_frames", T.LongType(), True),
        ]
    )

    def _decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            metas = pdf["payload"].map(multimodal.decode_audio_meta)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "format": metas.map(lambda t: t[0]),
                    "sample_rate": metas.map(lambda t: t[1]),
                    "n_channels": metas.map(lambda t: t[2]),
                    "bits": metas.map(lambda t: t[3]),
                    "n_frames": metas.map(lambda t: t[4]),
                }
            )

    return wavs.mapInPandas(_decode, meta_schema)


MULTIMODAL_WAV_ORACLE = """
SELECT doc_id AS asset_id, 'wav' AS format,
       CAST(8000 * (doc_id % 3 + 1) AS INT) AS sample_rate,
       1 AS n_channels, 16 AS bits,
       CAST(doc_id % 400 + 100 AS BIGINT) AS n_frames
FROM documents WHERE doc_id % 7 = 0
"""


def multimodal_frame_plan(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return multimodal.frame_sample_plan(multimodal.docs_as_assets(d), every_n=10)


FRAME_PLAN_ORACLE = """
SELECT doc_id AS asset_id, CAST(unnest(range(0, octet_length(encode(text)) % 300 + 1, 10)) AS INT) AS frame_idx
FROM documents
"""


def events_json_extract(spark, sf_dir):
    """JSON property extraction from the events props column — Spark uses the
    native get_json_object; the oracle mirrors it with a regex so no DuckDB
    JSON extension is required."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("prop_k"),
    )


EVENTS_JSON_ORACLE = r"""
SELECT event_id, CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INT) AS prop_k
FROM events
"""


def text_url_extract(spark, sf_dir):
    """URL/domain extraction + per-host profile (pipeline/text.py).  The
    fixture text has no URLs, so deterministic ones are appended per doc
    (host varies by doc_id) — the oracle re-derives them with the same
    regexes, so the hash checks the real extract/explode/group pipeline."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    with_urls = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and http://mirror.org/x"),
        ),
    )
    return text.host_profile(with_urls)


TEXT_URL_ORACLE = """
WITH d AS (
  SELECT doc_id,
         text || ' see https://site' || (doc_id % 7)
              || '.example.com/p/' || doc_id || ' and http://mirror.org/x' AS t
  FROM documents WHERE doc_id % 4 = 0
), u AS (
  SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^\\s]+')) AS url FROM d
), h AS (
  SELECT doc_id, url, regexp_extract(url, '^https?://([^/\\s]+)', 1) AS host FROM u
)
SELECT host, count(*) AS n_urls,
       count(DISTINCT url) AS n_unique_urls,
       count(DISTINCT doc_id) AS n_docs
FROM h GROUP BY host
"""


def dedup_neardup_clusters(spark, sf_dir):
    """Near-dup pairs -> connected components -> per-doc cluster assignment
    with cluster size.  The iterative label propagation is genuinely
    non-SQL in Spark, but the fixpoint it computes is transitive closure —
    which DuckDB's recursive CTE can replay exactly, so this iterative
    operator still gets a full value-hash oracle."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        d, threshold=0.6, n_docs=parquet_num_rows(sf_dir, "documents")
    )
    cc = dedup.connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")


def _neardup_clusters_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({NGRAM_JACCARD_ORACLE}) p
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach AS (
  SELECT id AS src, id AS dst FROM nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), cc AS (
  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT cc.doc_id, cc.cluster_id, s.cluster_size
FROM cc JOIN (
  SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY cluster_id
) s USING (cluster_id)
"""


def text_chunking(spark, sf_dir):
    """Sliding-window chunking (50-word windows, 10-word overlap) — the
    long-document -> training-sequence splitter."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return text.chunk_documents(d, size=50, overlap=10)


TEXT_CHUNKING_ORACLE = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id, CAST(s AS INT) AS chunk_idx,
       array_to_string(w[s*40+1 : s*40+50], ' ') AS chunk,
       CAST(len(w[s*40+1 : s*40+50]) AS INT) AS n_tokens
FROM d, LATERAL (
  SELECT unnest(range(0, greatest(1, CAST(ceil((len(w) - 10) / 40.0) AS BIGINT)))) AS s
) t
"""


def multimodal_thumbnails(spark, sf_dir):
    """Binary-in/binary-out resize stage (pipeline/multimodal.py thumbnails):
    fake-decoded dims scaled to fit 64px, thumbnail = payload byte prefix.
    The oracle verifies the binary output via md5 (the fixture payload is
    ASCII text bytes, so DuckDB's char-prefix == the byte prefix)."""
    d = load_table(spark, sf_dir, "documents")
    th = multimodal.thumbnails(multimodal.docs_as_assets(d), max_dim=64)
    return th.select(
        "asset_id", "t_width", "t_height", F.md5("thumb").alias("thumb_md5")
    )


MULTIMODAL_THUMBS_ORACLE = """
WITH a AS (
  SELECT doc_id AS asset_id, text, octet_length(encode(text)) AS n FROM documents
), dims AS (
  SELECT asset_id, text, (n % 640) + 1 AS w, ((n * 7) % 480) + 1 AS h FROM a
), s AS (
  SELECT asset_id, text, w, h, greatest(w, h) / 64.0 AS scale FROM dims
), t AS (
  SELECT asset_id,
         CASE WHEN scale > 1 THEN greatest(1, CAST(floor(w / scale) AS INT)) ELSE w END AS tw,
         CASE WHEN scale > 1 THEN greatest(1, CAST(floor(h / scale) AS INT)) ELSE h END AS th,
         text FROM s
)
SELECT asset_id, CAST(tw AS INT) AS t_width, CAST(th AS INT) AS t_height,
       md5(substring(text, 1, tw * th // 8 + 1)) AS thumb_md5
FROM t
"""


# --- corpus construction ----------------------------------------------------

def corpus_sample_stratified(spark, sf_dir):
    """Deterministic hash-bucket stratified sampling, summarized per source.
    Membership is md5(doc_id)-derived, so the oracle reproduces the exact
    sample — this is what makes the sample auditable at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    s = sampling.stratified_sample(
        d, key="doc_id", stratum="source", quotas={"src0": 80, "src1": 50}, default=25
    )
    return s.groupBy("source").agg(
        F.count("*").alias("n_kept"), F.sum("n_chars").alias("chars_kept")
    )


SAMPLE_STRATIFIED_ORACLE = """
WITH b AS (
  SELECT source, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
FROM b
WHERE bucket < (CASE source WHEN 'src0' THEN 80 WHEN 'src1' THEN 50 ELSE 25 END)
GROUP BY source
"""


def text_pii_redaction(spark, sf_dir):
    """PII scrubbing over documents salted with synthetic email/phone/card
    strings (the fixture corpus contains none), so the redaction rules are
    exercised for real and the redaction count is verifiable."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    did = F.col("doc_id").cast("string")
    salted = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact u"), did, F.lit("@ex-corp.io  tel +1 (555) 000-"),
            did, F.lit(" card 4111111111111111"),
        ),
    )
    return text.pii_redact(salted).select("doc_id", "redacted", "n_redactions")


PII_REDACTION_ORACLE = r"""
WITH salted AS (
  SELECT doc_id,
         text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex-corp.io  tel +1 (555) 000-'
              || CAST(doc_id AS VARCHAR) || ' card 4111111111111111' AS text
  FROM documents WHERE doc_id % 13 = 0
), red AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '[0-9]{13,19}', '<NUM>', 'g'),
             '\+?[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g'),
           '\s+', ' ', 'g')) AS redacted
  FROM salted
)
SELECT r.doc_id, r.redacted, n.n_redactions
FROM red r JOIN (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            + len(regexp_extract_all(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '[0-9]{13,19}'))
            + len(regexp_extract_all(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '[0-9]{13,19}', '<NUM>', 'g'), '\+?[0-9][0-9 ()-]{6,}[0-9]'))
          AS INT) AS n_redactions
  FROM salted
) n USING (doc_id)
"""


def corpus_quality_pipeline(spark, sf_dir):
    """End-to-end corpus prep: quality-score -> filter -> exact-dedup (keep
    lowest doc_id per content hash) -> per-source token-budget accounting.
    One declarative plan: scan-side scoring, a single shuffle for the dedup
    window, map-side-combined final aggregate."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.withColumn("quality", text.quality_factors()["quality"])
    kept = scored.filter(F.col("quality") >= 0.55)
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    dd = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return dd.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.regexp_count(F.col("text"), F.lit(r"\S+"))).alias("total_words"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


CORPUS_PIPELINE_ORACLE = rf"""
WITH scored AS (
  SELECT doc_id, text, source,
         0.4 * least(1.0, CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 100.0)
       + 0.3 * (CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS DOUBLE)
                / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0))
       + 0.3 * least(1.0, CAST(len(list_intersect(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> '')),
                                                  {_STOPS_SQL})) AS DOUBLE) / 3.0) AS quality
  FROM documents
), kept AS (
  SELECT * FROM scored WHERE quality >= 0.55
), dd AS (
  SELECT * FROM kept
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
)
SELECT source, count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_words,
       round(avg(quality), 6) AS avg_quality
FROM dd GROUP BY source
"""


def embedding_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization summary (scale, L1 norm of the
    quantized vector, max, saturation count)."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.quantize_int8(e)


QUANTIZE_ORACLE = """
WITH s AS (
  SELECT vec_id, embedding,
         127.0 / greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-12) AS scale
  FROM embeddings
), q AS (
  SELECT vec_id, scale,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * scale) AS INT)) AS qv
  FROM s
)
SELECT vec_id, round(scale, 6) AS scale,
       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
       CAST(list_max(qv) AS INT) AS q_max,
       CAST(len(list_filter(qv, x -> x = 127 OR x = -127)) AS INT) AS n_sat
FROM q
"""


QUERIES = {
    "dedup_exact": Query(dedup_exact, DEDUP_EXACT_ORACLE, ("dedup",)),
    "dedup_incremental_index": Query(
        dedup_incremental_index, DEDUP_INCREMENTAL_ORACLE, ("dedup", "corpus")
    ),
    "dedup_stats_by_source": Query(dedup_stats_by_source, DEDUP_STATS_ORACLE, ("dedup",)),
    "dedup_minhash_lsh": Query(dedup_minhash_lsh, None, ("dedup", "approx"), bench=True),
    "dedup_simhash": Query(dedup_simhash, None, ("dedup", "approx")),
    "dedup_ngram_jaccard": Query(dedup_ngram_jaccard, NGRAM_JACCARD_ORACLE, ("dedup",), bench=True),
    "dedup_embedding_cosine": Query(
        dedup_embedding_cosine, DEDUP_EMB_ORACLE, ("dedup", "similarity"), bench=True
    ),
    "sim_brute_force_topk": Query(sim_brute_force_topk, SIM_BRUTE_ORACLE, ("similarity",), bench=True),
    "sim_ivf_topk": Query(sim_ivf_topk, None, ("similarity", "approx")),
    "sim_lsh_topk": Query(sim_lsh_topk, None, ("similarity", "approx"), bench=True),
    "sim_ivf_full_probe": Query(sim_ivf_full_probe, SIM_BRUTE_ORACLE, ("similarity",)),
    "sim_lsh_full_cover": Query(sim_lsh_full_cover, SIM_BRUTE_ORACLE, ("similarity",)),
    # bench=True: third tracked ANN path (after LSH and the bucketed
    # near-dup) — PQ is the compressed-scan shape, worth round-over-round
    # timing like the others
    "sim_pq_topk": Query(sim_pq_topk, None, ("similarity", "approx"), bench=True),
    "sim_pq_rerank_full": Query(sim_pq_rerank_full, SIM_BRUTE_ORACLE, ("similarity",)),
    "sim_ivfpq_topk": Query(sim_ivfpq_topk, None, ("similarity", "approx")),
    # bench=True: steady-state ANN search over the persisted index (build
    # amortized behind the source stamp) — tracked separately from the
    # train+encode-dominated sim_pq_topk
    "sim_ivfpq_indexed": Query(
        sim_ivfpq_indexed, None, ("similarity", "approx", "index"), bench=True
    ),
    "sim_ivfpq_full_cover": Query(
        sim_ivfpq_full_cover, SIM_BRUTE_ORACLE, ("similarity",)
    ),
    "embedding_l2_normalize": Query(
        embedding_l2_normalize, EMB_L2_ORACLE, ("similarity", "embedding")
    ),
    "embedding_mean_pool": Query(
        embedding_mean_pool, EMB_MEAN_POOL_ORACLE, ("similarity", "embedding")
    ),
    "embedding_pca_variance": Query(
        embedding_pca_variance, EMB_PCA_VAR_ORACLE, ("similarity", "embedding")
    ),
    "dedup_minhash_bands_sql": Query(
        dedup_minhash_bands_sql, MINHASH_BANDS_ORACLE, ("dedup",)
    ),
    "dedup_simhash_fp_sql": Query(dedup_simhash_fp_sql, SIMHASH_FP_ORACLE, ("dedup",)),
    "sim_ivf_indexed": Query(
        sim_ivf_indexed, None, ("similarity", "approx", "index"), bench=True
    ),
    "sim_knn_classify": Query(sim_knn_classify, SIM_KNN_ORACLE, ("similarity",)),
    "text_token_counts": Query(text_token_counts, TOKEN_COUNTS_ORACLE, ("text",)),
    "text_quality_scores": Query(text_quality_scores, QUALITY_ORACLE, ("text",)),
    "text_lang_id": Query(text_lang_id, LANG_ID_ORACLE, ("text",)),
    "text_fingerprints": Query(text_fingerprints, FINGERPRINT_ORACLE, ("text",)),
    "text_repetition_filters": Query(
        text_repetition_filters, TEXT_REPETITION_ORACLE, ("text", "quality")
    ),
    "dedup_lines_global": Query(
        dedup_lines_global, DEDUP_LINES_GLOBAL_ORACLE, ("dedup", "corpus")
    ),
    "text_bpe_tokenize": Query(text_bpe_tokenize, None, ("text", "approx")),
    "text_bpe_merges_check": Query(
        text_bpe_merges_check, BPE_MERGES_CHECK_ORACLE, ("text",)
    ),
    "text_unigram_logprob": Query(
        text_unigram_logprob, UNIGRAM_LOGPROB_ORACLE, ("text", "agg")
    ),
    "text_url_extract": Query(text_url_extract, TEXT_URL_ORACLE, ("text",)),
    "multimodal_features": Query(multimodal_features, MULTIMODAL_ORACLE, ("multimodal",)),
    "multimodal_png_decode": Query(multimodal_png_decode, MULTIMODAL_PNG_ORACLE, ("multimodal",)),
    "multimodal_wav_decode": Query(multimodal_wav_decode, MULTIMODAL_WAV_ORACLE, ("multimodal",)),
    "multimodal_frame_plan": Query(multimodal_frame_plan, FRAME_PLAN_ORACLE, ("multimodal",)),
    "multimodal_thumbnails": Query(
        multimodal_thumbnails, MULTIMODAL_THUMBS_ORACLE, ("multimodal",)
    ),
    "events_json_extract": Query(events_json_extract, EVENTS_JSON_ORACLE, ("events",)),
    "dedup_neardup_clusters": Query(
        dedup_neardup_clusters, _neardup_clusters_oracle(), ("dedup", "graph")
    ),
    "corpus_sample_stratified": Query(
        corpus_sample_stratified, SAMPLE_STRATIFIED_ORACLE, ("corpus", "sampling")
    ),
    "text_pii_redaction": Query(text_pii_redaction, PII_REDACTION_ORACLE, ("text", "corpus")),
    "text_chunking": Query(text_chunking, TEXT_CHUNKING_ORACLE, ("text", "corpus")),
    "corpus_quality_pipeline": Query(
        corpus_quality_pipeline, CORPUS_PIPELINE_ORACLE, ("corpus", "dedup", "text")
    ),
    "embedding_quantize_int8": Query(
        embedding_quantize_int8, QUANTIZE_ORACLE, ("similarity", "corpus")
    ),
}


# --- round 5: lexical retrieval + substring/novelty text dedup signals ----

_BM25_QUERIES = [
    (1, "spark window query"),
    (2, "customer order line"),
    (3, "filter merge sort table"),
]


def text_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval (text.bm25_topk — the lexical half of RAG /
    retrieval curation): 3 fixed query strings over the documents corpus.
    The DuckDB oracle recomputes the exact Robertson formula term by term,
    so the hash proves tokenize → tf/df/dl/avgdl → score → top-k end to
    end.  Query-term broadcast restriction keeps the shuffles candidate-
    sized (see the operator docstring)."""
    d = load_table(spark, sf_dir, "documents")
    return text.bm25_topk(
        d, _BM25_QUERIES, k=5, n_docs=parquet_num_rows(sf_dir, "documents")
    )


BM25_ORACLE = """
WITH toks AS (
  SELECT doc_id, u.term
  FROM documents,
       UNNEST(list_filter(string_split_regex(lower(text), '\\s+'),
                          x -> x <> '')) AS u(term)
), q(q_id, term) AS (
  VALUES (1, 'spark'), (1, 'window'), (1, 'query'),
         (2, 'customer'), (2, 'order'), (2, 'line'),
         (3, 'filter'), (3, 'merge'), (3, 'sort'), (3, 'table')
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), scored AS (
  SELECT q.q_id, tf.doc_id,
         round(sum(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ), 6) AS score
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN dfreq ON dfreq.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q.q_id, tf.doc_id
)
SELECT q_id, doc_id, rank, score FROM (
  SELECT q_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


def text_ngram_novelty(spark, sf_dir):
    """Per-doc word-3-gram novelty (text.ngram_novelty): the fraction of a
    doc's distinct 3-grams first seen (min doc_id) in that doc — the
    freshness signal incremental corpus builds rank new crawls by."""
    d = load_table(spark, sf_dir, "documents")
    return text.ngram_novelty(d, n=3)


NGRAM_NOVELTY_ORACLE = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[i : i + 2], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 3
), first AS (
  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
)
SELECT g.doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM grams g JOIN first f ON f.gram = g.gram
GROUP BY g.doc_id
"""


def dedup_substring_windows(spark, sf_dir):
    """Window-granular exact-substring duplication
    (text.substring_window_dupes; Lee et al. 2022 substring dedup at
    stride granularity): per-doc count of 40-char windows that occur
    verbatim in another doc."""
    d = load_table(spark, sf_dir, "documents")
    return text.substring_window_dupes(d, win=40, stride=10)


SUBSTRING_WINDOWS_ORACLE = """
WITH wins AS (
  SELECT DISTINCT doc_id, md5(substr(text, i, 40)) AS wh
  FROM documents,
       UNNEST(generate_series(1, length(text) - 39, 10)) AS t(i)
  WHERE length(text) >= 40
), shared AS (
  SELECT wh, count(DISTINCT doc_id) AS n_docs_with FROM wins GROUP BY wh
)
SELECT w.doc_id, count(*) AS n_windows,
       CAST(sum(CASE WHEN s.n_docs_with > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shared,
       round(sum(CASE WHEN s.n_docs_with > 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS dup_fraction
FROM wins w JOIN shared s ON s.wh = w.wh
GROUP BY w.doc_id
"""


QUERIES["text_bm25_topk"] = Query(
    text_bm25_topk, BM25_ORACLE, ("text", "similarity", "retrieval"),
    bench=True,
)
QUERIES["text_ngram_novelty"] = Query(
    text_ngram_novelty, NGRAM_NOVELTY_ORACLE, ("text", "dedup")
)
QUERIES["dedup_substring_windows"] = Query(
    dedup_substring_windows, SUBSTRING_WINDOWS_ORACLE, ("dedup", "text")
)


def dedup_url_canonical(spark, sf_dir):
    """Canonical-URL dedup (the CommonCrawl-style pipeline step: one doc
    per canonical URL): scheme dropped, host lowercased, query string and
    fragment and trailing slash stripped — then keep min(doc_id) per
    canonical URL and report collision groups.  The fixture has no URLs,
    so deterministic ones are synthesized per doc (same-canonical variants
    differ by scheme/query/slash); the oracle re-derives the whole
    normalization with the same expressions."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise(
            F.lit("http://")
        ),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.Site")).otherwise(
            F.lit("www.site")
        ),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com/page/"),
        (F.col("doc_id") % 40).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("?utm_source=s"), (F.col("doc_id") % 3).cast("string")),
        ).otherwise(F.lit("")),
    )
    canon = F.regexp_replace(
        F.regexp_replace(F.lower(url), r"^https?://", ""), r"[?#].*$", ""
    )
    canon = F.regexp_replace(canon, r"/$", "")
    return (
        d.select(F.col("doc_id"), canon.alias("curl"))
        .groupBy("curl")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


DEDUP_URL_CANONICAL_ORACLE = """
WITH u AS (
  SELECT doc_id,
         concat(
           CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END,
           CASE WHEN doc_id % 3 = 0 THEN 'WWW.Site' ELSE 'www.site' END,
           CAST(doc_id % 5 AS VARCHAR), '.example.com/page/',
           CAST(doc_id % 40 AS VARCHAR),
           CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
           CASE WHEN doc_id % 2 = 0
                THEN concat('?utm_source=s', CAST(doc_id % 3 AS VARCHAR))
                ELSE '' END
         ) AS url
  FROM documents
), c AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(lower(url), '^https?://', ''),
             '[?#].*$', ''),
           '/$', '') AS curl
  FROM u
)
SELECT curl, count(*) AS n_docs, CAST(min(doc_id) AS BIGINT) AS keep_id
FROM c GROUP BY curl HAVING count(*) > 1
"""


def events_transition_matrix(spark, sf_dir):
    """Per-user event-type transition counts (the Markov-chain /
    user-path analytics primitive): lead(event_type) over each user's
    time-ordered stream, then count (from, to) pairs.  One window shuffle
    on user_id, one keyed aggregation — linear at any event volume."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "user_id",
        F.col("event_type").alias("from_t"),
        F.lead("event_type").over(w).alias("to_t"),
    ).filter(F.col("to_t").isNotNull())
    return (
        steps.groupBy("from_t", "to_t")
        .agg(F.count("*").alias("n"))
    )


EVENTS_TRANSITION_ORACLE = """
WITH s AS (
  SELECT user_id, event_type AS from_t,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_t
  FROM events
)
SELECT from_t, to_t, count(*) AS n
FROM s WHERE to_t IS NOT NULL
GROUP BY from_t, to_t
"""


QUERIES["dedup_url_canonical"] = Query(
    dedup_url_canonical, DEDUP_URL_CANONICAL_ORACLE, ("dedup", "text", "url")
)
QUERIES["events_transition_matrix"] = Query(
    events_transition_matrix, EVENTS_TRANSITION_ORACLE, ("events", "window")
)


def sim_ivf_index_append(spark, sf_dir):
    """Incremental vector-index ingest (similarity.ivf_index_append — the
    continuous-ingest path): the index is BUILT from only half the corpus,
    the other half APPENDS against the frozen centroids (no retrain,
    partition-local file appends), then a FULL-probe search (nprobe =
    n_centroids) must reproduce the exact brute-force top-k over the WHOLE
    corpus — proving the appended vectors are searchable and nothing was
    lost or duplicated.  Partial-nprobe recall stays covered by
    tests/test_pipeline.py and the sim_ivf_indexed bench row."""
    import os
    import shutil

    emb, q = _emb_queries(spark, sf_dir)
    idx = f"/tmp/tbs_ivf_append/{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(idx, ignore_errors=True)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    similarity.build_ivf_index(half_a, idx, n_centroids=8)
    similarity.ivf_index_append(spark, idx, half_b)
    return similarity.ivf_search_indexed(spark, idx, q, k=5, nprobe=8)


QUERIES["sim_ivf_index_append"] = Query(
    sim_ivf_index_append, SIM_BRUTE_ORACLE, ("similarity", "index", "ingest")
)


def dedup_keep_best(spark, sf_dir):
    """Keep-BEST-duplicate dedup (dedup.keep_best_duplicate): clusters on
    the punctuation/case-normalized content key and keeps the
    highest-quality member per cluster (production survivor choice — drop
    the mangled copy, keep the clean one — vs exact dedup's min-id).
    Summarized per source: kept counts, cluster stats, id checksum of the
    survivors."""
    from tensorbase_spark.pipeline import dedup
    from tensorbase_spark.pipeline import text as T

    d = load_table(spark, sf_dir, "documents")
    verdicts = dedup.keep_best_duplicate(d, T.quality_factors()["quality"])
    return (
        verdicts.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.max("cluster_size").alias("max_cluster"),
            F.sum(F.when(F.col("kept"), F.col("doc_id"))).alias(
                "kept_id_checksum"
            ),
        )
    )


DEDUP_KEEP_BEST_ORACLE = r"""
WITH q AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS cluster_key,
         0.4 * least(1.0, CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 100.0)
       + 0.3 * (CAST(len(list_distinct(list_filter(
                   string_split_regex(text, '\s+'), x -> x <> '')))
                 AS DOUBLE)
                / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0))
       + 0.3 * least(1.0, CAST(len(list_intersect(
                   list_distinct(list_filter(string_split_regex(text, '\s+'),
                                             x -> x <> '')),
                   ['the','a','of','and','is','to','in','that']))
                 AS DOUBLE) / 3.0) AS quality
  FROM documents
), ranked AS (
  SELECT doc_id, source, cluster_key,
         count(*) OVER (PARTITION BY cluster_key) AS cluster_size,
         row_number() OVER (PARTITION BY cluster_key
                            ORDER BY quality DESC, doc_id) AS rn
  FROM q
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(max(cluster_size) AS BIGINT) AS max_cluster,
       CAST(sum(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
         AS kept_id_checksum
FROM ranked GROUP BY source
"""


def dedup_edit_distance(spark, sf_dir):
    """Edit-distance near-dup probe (dedup.edit_distance_neardups):
    prefix-blocked candidate pairs, bounded-window Levenshtein verify,
    min-distance partner per doc — summarized per distance decile so the
    result is aggregate-stable."""
    from tensorbase_spark.pipeline import dedup

    d = load_table(spark, sf_dir, "documents")
    nn = dedup.edit_distance_neardups(d)
    return nn.groupBy((F.col("nn_dist") - F.col("nn_dist") % 10).alias(
        "dist_bucket"
    )).agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("id_checksum"),
        F.min("nn_dist").alias("min_dist"),
    )


DEDUP_EDIT_DISTANCE_ORACLE = """
WITH base AS (
  SELECT doc_id, substr(lower(text), 1, 12) AS blk,
         substr(lower(text), 1, 80) AS cmp
  FROM documents
), ranked AS (
  SELECT *, length(cmp) AS lc,
         row_number() OVER (PARTITION BY blk ORDER BY length(cmp), cmp,
                            doc_id) AS rk
  FROM base
), pairs AS (
  -- sorted-neighborhood candidates: the banded rank join in Spark is a
  -- DISTRIBUTION strategy; the candidate SET is exactly this condition
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         levenshtein(a.cmp, b.cmp) AS dist
  FROM ranked a JOIN ranked b ON a.blk = b.blk AND a.doc_id <> b.doc_id
   AND abs(a.rk - b.rk) <= 16 AND abs(a.lc - b.lc) <= 20
), nn AS (
  SELECT a_id AS doc_id, b_id AS nn_id, dist AS nn_dist,
         row_number() OVER (PARTITION BY a_id ORDER BY dist, b_id) AS rn
  FROM pairs
)
SELECT (nn_dist - nn_dist % 10) AS dist_bucket,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       min(nn_dist) AS min_dist
FROM nn WHERE rn = 1 GROUP BY 1
"""


def text_zipf_slope(spark, sf_dir):
    """Corpus Zipf slope/intercept over the top-1000 tokens
    (text.zipf_stats) — the one-number corpus-health probe; computed via
    covar_pop/var_pop so the oracle reproduces the identical least-squares
    arithmetic."""
    from tensorbase_spark.pipeline import text as T

    d = load_table(spark, sf_dir, "documents")
    return T.zipf_stats(d, top_n=1000)


TEXT_ZIPF_ORACLE = r"""
WITH toks AS (
  SELECT u.tok FROM documents,
       UNNEST(list_filter(string_split_regex(lower(text), '\s+'),
                          x -> x <> '')) AS u(tok)
), freq AS (
  SELECT tok, count(*) AS n FROM toks GROUP BY tok
), totals AS (
  SELECT CAST(count(*) AS BIGINT) AS vocab_size,
         CAST(sum(n) AS BIGINT) AS n_tokens FROM freq
), top AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank
  FROM freq ORDER BY n DESC, tok LIMIT 1000
), xy AS (
  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y FROM top
), reg AS (
  SELECT covar_pop(x, y) / var_pop(x) AS slope,
         avg(x) AS mx, avg(y) AS my,
         CAST(count(*) AS BIGINT) AS n_ranked
  FROM xy
)
SELECT round(slope, 6) AS zipf_slope,
       round(my - slope * mx, 6) AS zipf_intercept,
       n_ranked, vocab_size, n_tokens
FROM reg CROSS JOIN totals
"""


QUERIES["dedup_keep_best"] = Query(
    dedup_keep_best, DEDUP_KEEP_BEST_ORACLE, ("dedup", "quality")
)
QUERIES["dedup_edit_distance"] = Query(
    dedup_edit_distance, DEDUP_EDIT_DISTANCE_ORACLE, ("dedup", "similarity")
)
QUERIES["text_zipf_slope"] = Query(
    text_zipf_slope, TEXT_ZIPF_ORACLE, ("text", "stats")
)


def _lined_documents(spark, sf_dir):
    """The fixture corpus is single-line (no \\n, no punctuation); the
    line-structure operators need lines.  Synthesize them with literal
    left-to-right replaces — identical semantics in Spark and DuckDB, so
    the oracle reproduces the exact same text: ' the '->sentence break,
    ' value '->bullet line, ' fast '->ellipsis line."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("text", F.expr("replace(text, ' the ', '.' || char(10))"))
        .withColumn("text", F.expr("replace(text, ' value ', char(10) || '- ')"))
        .withColumn("text", F.expr("replace(text, ' fast ', '...' || char(10))"))
    )


_LINED_SQL = """
  SELECT doc_id, source,
         replace(replace(replace(text, ' the ', '.' || chr(10)),
                         ' value ', chr(10) || '- '),
                 ' fast ', '...' || chr(10)) AS text
  FROM documents
"""


def text_gopher_rules(spark, sf_dir):
    """Gopher quality-rule verdicts (pipeline/text.py gopher_quality_rules;
    Rae et al. 2021 table A1) over line-synthesized documents — one
    map-only codegen'd projection, zero shuffles."""
    return text.gopher_quality_rules(_lined_documents(spark, sf_dir))


TEXT_GOPHER_ORACLE = rf"""
WITH base AS ({_LINED_SQL}),
t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                     x -> x <> '') AS lines,
         CAST(len(regexp_extract_all(text, '#'))
            + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) AS n_symbols
  FROM base
), m AS (
  SELECT doc_id,
         CAST(len(words) AS DOUBLE) AS n_words,
         CAST(coalesce(list_aggregate(list_transform(words, w -> length(w)), 'sum'), 0) AS DOUBLE) AS sum_wl,
         n_symbols,
         CAST(len(lines) AS DOUBLE) AS n_lines,
         CAST(len(list_filter(lines, x -> regexp_matches(x, '^[-*•]'))) AS DOUBLE) AS n_bullet,
         CAST(len(list_filter(lines, x -> regexp_matches(x, '\.\.\.$'))) AS DOUBLE) AS n_ellip,
         CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) AS n_alpha,
         len(list_intersect(list_distinct(words), {_STOPS_SQL})) AS stop_hits
  FROM t
)
SELECT doc_id,
       CAST(n_words AS INT) AS n_words,
       CAST(n_words >= 50 AND n_words <= 100000 AS INT) AS r_words,
       CAST(sum_wl / greatest(n_words, 1.0) >= 3.0
            AND sum_wl / greatest(n_words, 1.0) <= 10.0 AS INT) AS r_mean_wl,
       CAST(n_symbols / greatest(n_words, 1.0) <= 0.1 AS INT) AS r_symbol,
       CAST(n_bullet / greatest(n_lines, 1.0) <= 0.9 AS INT) AS r_bullet,
       CAST(n_ellip / greatest(n_lines, 1.0) <= 0.3 AS INT) AS r_ellipsis,
       CAST(n_alpha / greatest(n_words, 1.0) >= 0.8 AS INT) AS r_alpha,
       CAST(stop_hits >= 2 AS INT) AS r_stops,
       CAST(n_words >= 50 AND n_words <= 100000
            AND sum_wl / greatest(n_words, 1.0) >= 3.0
            AND sum_wl / greatest(n_words, 1.0) <= 10.0
            AND n_symbols / greatest(n_words, 1.0) <= 0.1
            AND n_bullet / greatest(n_lines, 1.0) <= 0.9
            AND n_ellip / greatest(n_lines, 1.0) <= 0.3
            AND n_alpha / greatest(n_words, 1.0) >= 0.8
            AND stop_hits >= 2 AS INT) AS keep
FROM m
"""


def text_c4_clean(spark, sf_dir):
    """C4 line cleaning (pipeline/text.py c4_line_clean; Raffel et al. 2020
    §2.2) over line-synthesized documents, with a 'lorem ipsum' poison
    salted onto every 97th doc so the document-drop rule fires for real.
    clean_text is md5'd: the value-identity check without hauling full
    text through the driver hash."""
    d = _lined_documents(spark, sf_dir).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 97 == 0, F.concat(F.col("text"), F.lit(" lorem ipsum"))
        ).otherwise(F.col("text")),
    )
    out = text.c4_line_clean(d)
    return out.select(
        "doc_id", "n_lines", "n_kept", "doc_dropped",
        F.md5(F.col("clean_text")).alias("clean_md5"),
    )


TEXT_C4_ORACLE = rf"""
WITH lined AS ({_LINED_SQL}),
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 0 THEN text || ' lorem ipsum' ELSE text END AS text
  FROM lined
), t AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                     x -> x <> '') AS lines,
         (contains(lower(text), 'lorem ipsum') OR contains(text, '{{')) AS bad
  FROM base
), k AS (
  SELECT doc_id, lines, bad,
         CASE WHEN bad THEN [] ELSE
           list_filter(lines, x -> regexp_matches(x, '[.!?"'']$')
             AND len(list_filter(string_split_regex(x, '\s+'), y -> y <> '')) >= 5)
         END AS kept
  FROM t
)
SELECT doc_id,
       CAST(len(lines) AS INT) AS n_lines,
       CAST(len(kept) AS INT) AS n_kept,
       CAST(bad AS INT) AS doc_dropped,
       md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
FROM k
"""


def text_boilerplate_lines(spark, sf_dir):
    """Within-source boilerplate census (pipeline/text.py boilerplate_lines):
    two deterministic footer lines appended per source so every source has
    true boilerplate; the census shuffle carries 64-bit line hashes, never
    text."""
    d = _lined_documents(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit("\nfooter of "), F.col("source"),
            F.lit("\ncopyright "), F.col("source"),
        ),
    )
    return text.boilerplate_lines(d, min_docs=3)


TEXT_BOILERPLATE_ORACLE = rf"""
WITH lined AS ({_LINED_SQL}),
base AS (
  SELECT doc_id, source,
         text || chr(10) || 'footer of ' || source
              || chr(10) || 'copyright ' || source AS text
  FROM lined
), ex AS (
  SELECT source AS grp, doc_id, unnest(
    list_distinct(list_filter(list_transform(string_split(text, chr(10)),
                                             x -> trim(x)), x -> x <> ''))
  ) AS line
  FROM base
), census AS (
  SELECT grp, line FROM ex GROUP BY grp, line
  HAVING count(DISTINCT doc_id) >= 3
)
SELECT ex.grp AS source, ex.doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN c.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate
FROM ex LEFT JOIN census c ON ex.grp = c.grp AND ex.line = c.line
GROUP BY ex.grp, ex.doc_id
"""


QUERIES["text_gopher_rules"] = Query(
    text_gopher_rules, TEXT_GOPHER_ORACLE, ("text", "quality", "gopher")
)
QUERIES["text_c4_clean"] = Query(
    text_c4_clean, TEXT_C4_ORACLE, ("text", "quality", "c4")
)
QUERIES["text_boilerplate_lines"] = Query(
    text_boilerplate_lines, TEXT_BOILERPLATE_ORACLE, ("text", "dedup", "boilerplate")
)


def metrics_binary_auc(spark, sf_dir):
    """Distributed ROC-AUC (pipeline/metrics.py binary_auc): label = 'is
    English', score = doc length — a weak-but-nonrandom classifier, so the
    AUC must be strictly between 0 and 1 and engine-reproducible.  One
    bounded keyed shuffle (<= bins rows); the rank-sum windows run over
    bin counts, never rows."""
    from tensorbase_spark.pipeline import metrics

    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return metrics.binary_auc(d, bins=1000)


METRICS_AUC_ORACLE = """
WITH src AS (
  SELECT CAST(n_chars AS DOUBLE) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), rng AS (
  SELECT min(s) AS lo, max(s) AS hi FROM src
), binned AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE least(CAST(floor((s - lo) / (hi - lo) * 1000) AS BIGINT), 999)
         END AS b, y
  FROM src CROSS JOIN rng
), per_bin AS (
  SELECT b, sum(y) AS pos, sum(1 - y) AS neg FROM binned GROUP BY b
), ranked AS (
  SELECT b, pos, neg,
         coalesce(sum(neg) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM per_bin
)
SELECT round((sum(pos * neg_below) + sum(pos * neg * 0.5))
             / (sum(pos) * sum(neg)), 6) AS auc,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(neg) AS BIGINT) AS n_neg,
       count(*) AS n_bins_used
FROM ranked
"""


def metrics_pr_points(spark, sf_dir):
    """Precision/recall calibration table (pipeline/metrics.py
    precision_recall_points): same doc-length classifier, thresholds on
    the raw char count.  Map-only conditional sums folded into ONE 1-row
    aggregate, exploded back to a threshold table."""
    from tensorbase_spark.pipeline import metrics

    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return metrics.precision_recall_points(
        d, thresholds=[100.0, 200.0, 300.0, 400.0]
    )


METRICS_PR_ORACLE = """
WITH src AS (
  SELECT CAST(n_chars AS DOUBLE) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), t AS (  -- DOUBLE literals: bare 100.0 is DECIMAL in DuckDB, which the
           -- driver canonicalizer str()s as '100.0' vs float '100'
  SELECT CAST(unnest([100.0, 200.0, 300.0, 400.0]) AS DOUBLE) AS threshold
)
SELECT t.threshold,
       round(sum(CASE WHEN s >= t.threshold THEN y ELSE 0 END)
             / greatest(sum(CASE WHEN s >= t.threshold THEN 1 ELSE 0 END), 1), 6) AS precision,
       round(sum(CASE WHEN s >= t.threshold THEN y ELSE 0 END)
             / greatest(sum(y), 1), 6) AS recall,
       CAST(sum(CASE WHEN s >= t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM src CROSS JOIN t
GROUP BY t.threshold
"""


QUERIES["metrics_binary_auc"] = Query(
    metrics_binary_auc, METRICS_AUC_ORACLE, ("metrics", "eval")
)
QUERIES["metrics_pr_points"] = Query(
    metrics_pr_points, METRICS_PR_ORACLE, ("metrics", "eval")
)


def text_html_extract(spark, sf_dir):
    """HTML boilerplate stripping (pipeline/text.py html_to_text) over
    documents wrapped in deterministic synthetic HTML (head+script blocks,
    paragraph structure from sentence breaks, a comment, entities) — the
    oracle reproduces the identical wrap and the same RE2-compatible
    regex chain, so the extraction is value-checked end to end."""
    d = load_table(spark, sf_dir, "documents")
    wrapped = d.withColumn(
        "text",
        F.expr(
            "concat('<html><head><title>d</title>"
            "<script>var x = 1 < 2;</script>"
            "<style>p { color: red }</style></head><body><h1>Doc ', "
            "cast(doc_id as string), "
            "'</h1><p>', replace(text, ' the ', '</p><p>'), "
            "'</p><!-- crawler: &amp; -->'"
            ", '<div>tail &lt;EOF&gt;</div></body></html>')"
        ),
    )
    out = text.html_to_text(wrapped)
    return out.select(
        "doc_id",
        "n_clean_chars",
        F.md5(F.col("clean_text")).alias("clean_md5"),
    )


def _html_oracle() -> str:
    """Build the DuckDB regex chain PROGRAMMATICALLY in the exact order of
    pipeline/text.py html_to_text — hand-nesting 14 calls is how paren
    bugs happen."""
    expr = "html"
    for blk in ("script", "style", "head", "noscript"):
        expr = f"regexp_replace({expr}, '(?is)<{blk}[^>]*>.*?</{blk}>', ' ', 'g')"
    expr = f"regexp_replace({expr}, '(?s)<!--.*?-->', ' ', 'g')"
    expr = (
        f"regexp_replace({expr}, "
        "'(?i)<br[^>]*>|</p>|</div>|</li>|</h[1-6]>|</tr>', chr(10), 'g')"
    )
    expr = f"regexp_replace({expr}, '<[^>]*>', ' ', 'g')"
    for ent, ch in (
        ("&nbsp;", "' '"), ("&lt;", "'<'"), ("&gt;", "'>'"),
        ("&quot;", chr(39) + '"' + chr(39)), ("&#39;", "chr(39)"),
        ("&amp;", "'&'"),
    ):
        expr = f"replace({expr}, '{ent}', {ch})"
    expr = f"regexp_replace({expr}, '[ ' || chr(9) || ']+', ' ', 'g')"
    expr = f"regexp_replace({expr}, ' ?' || chr(10) || ' ?', chr(10), 'g')"
    expr = f"regexp_replace({expr}, chr(10) || '{{2,}}', chr(10), 'g')"
    expr = (
        f"regexp_replace({expr}, '^' || chr(10) || '+|' || chr(10) || '+$', '', 'g')"
    )
    return f"""
WITH wrapped AS (
  SELECT doc_id,
         '<html><head><title>d</title><script>var x = 1 < 2;</script>'
         || '<style>p {{ color: red }}</style></head><body><h1>Doc '
         || CAST(doc_id AS VARCHAR) || '</h1><p>'
         || replace(text, ' the ', '</p><p>')
         || '</p><!-- crawler: &amp; --><div>tail &lt;EOF&gt;</div></body></html>'
         AS html
  FROM documents
), stripped AS (
  SELECT doc_id, trim({expr}) AS clean_text FROM wrapped
)
SELECT doc_id, CAST(length(clean_text) AS BIGINT) AS n_clean_chars,
       md5(clean_text) AS clean_md5
FROM stripped
"""


TEXT_HTML_ORACLE = _html_oracle()


QUERIES["text_html_extract"] = Query(
    text_html_extract, TEXT_HTML_ORACLE, ("text", "extraction", "html")
)


def multimodal_ahash_dedup(spark, sf_dir):
    """Perceptual image dedup end to end (pipeline/multimodal.py
    image_ahash + image_neardup_pairs): every doc synthesizes a REAL
    16×16 grayscale PNG whose pattern class is doc_id % 8 — members of a
    class differ by ±(doc_id % 3) low-bit noise that provably cannot move
    an 8×8 block mean across the global mean (base pixels sit at 40/200),
    so aHash is identical within a class and the hamming-0 pair count per
    class is EXACTLY C(m, 2).  The oracle computes that combinatorially
    from doc_id arithmetic — the hash can only match if PNG encode →
    full pixel decode (all five scanline filters) → block-mean aHash →
    band join → hamming verify is faithful end to end."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    assets = d.select(F.col("doc_id").alias("asset_id"))

    def _synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids = pdf["asset_id"]
            payloads = []
            for i in ids:
                i = int(i)
                cls, noise = i % 8, i % 3

                def px(x, y, cls=cls, noise=noise):
                    # class pattern: a distinct half-plane per class over
                    # far-from-mean levels; noise stays in low bits
                    on = (x + (cls % 4) * y) % 8 < (cls % 7) + 1
                    return (200 if on else 40) + noise

                payloads.append(multimodal.encode_png(16, 16, px))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    pngs = assets.mapInPandas(
        _synth,
        T.StructType(
            [
                T.StructField("asset_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    )
    hashed = multimodal.image_ahash(pngs)
    pairs = multimodal.image_neardup_pairs(hashed, max_hamming=0)
    return (
        pairs.withColumn("cls", F.col("id_a") % 8)
        .groupBy("cls")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("cls")
    )


MULTIMODAL_AHASH_ORACLE = """
WITH members AS (
  SELECT doc_id % 8 AS cls, count(*) AS m
  FROM documents WHERE doc_id < 200
  GROUP BY doc_id % 8
)
SELECT cls, CAST(m * (m - 1) / 2 AS BIGINT) AS n_pairs
FROM members WHERE m >= 2 ORDER BY cls
"""


QUERIES["multimodal_ahash_dedup"] = Query(
    multimodal_ahash_dedup, MULTIMODAL_AHASH_ORACLE,
    ("multimodal", "dedup", "perceptual-hash"),
)


def multimodal_phash_dedup(spark, sf_dir):
    """DCT perceptual-hash image dedup end to end (pipeline/multimodal.py
    phash + dhash + the shared banded pairing): every doc synthesizes a
    REAL 16×16 grayscale PNG whose pattern class is doc_id % 8 — members
    of a class differ by a per-doc AFFINE brightness map (gain
    1 + doc_id % 3, offset 12 × (doc_id % 5); integer-exact, no
    clamping).  pHash excludes the DC term and thresholds by the AC
    median, and dHash compares adjacent block means, so BOTH are provably
    invariant under any positive affine map — within a class the hashes
    are identical and the hamming-0 same-class pair count is EXACTLY
    C(m, 2) for each.  The oracle computes that combinatorially from
    doc_id arithmetic — it can only match if PNG encode → scanline
    decode → resample → DCT / gradient bits → band join → verify is
    faithful end to end for both hash schemes."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    assets = d.select(F.col("doc_id").alias("asset_id"))

    def _synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids = pdf["asset_id"]
            payloads = []
            for i in ids:
                i = int(i)
                cls, gain, off = i % 8, 1 + i % 3, 12 * (i % 5)

                def px(x, y, cls=cls, gain=gain, off=off):
                    # a RICH 16-level class pattern: every DCT coefficient
                    # sits far from the AC median, so the float-noise of
                    # scaled re-computation can never cross a threshold
                    # (a blocky 2-level pattern leaves many coefficients
                    # exactly 0 == median, where ties flip)
                    base = 4 + 4 * (
                        (x * (3 + cls % 5) + y * (7 + cls % 3) + x * y) % 16
                    )
                    return base * gain + off  # ≤ 64·3 + 48 = 240

                payloads.append(multimodal.encode_png(16, 16, px))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    pngs = assets.mapInPandas(
        _synth,
        T.StructType(
            [
                T.StructField("asset_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    ).localCheckpoint(eager=False)

    def _pairs_per_class(hashed):
        p = multimodal.image_neardup_pairs(hashed, max_hamming=0)
        return (
            p.filter((F.col("id_a") % 8) == (F.col("id_b") % 8))
            .withColumn("cls", F.col("id_a") % 8)
            .groupBy("cls")
            .agg(F.count("*").alias("n_pairs"))
        )

    ph = _pairs_per_class(multimodal.image_phash(pngs))
    dh = _pairs_per_class(multimodal.image_dhash(pngs)).withColumnRenamed(
        "n_pairs", "n_pairs_dhash"
    )
    return (
        ph.join(dh, "cls", "full")
        .select(
            "cls",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs_phash"),
            F.coalesce("n_pairs_dhash", F.lit(0)).alias("n_pairs_dhash"),
        )
        .orderBy("cls")
    )


MULTIMODAL_PHASH_ORACLE = """
WITH members AS (
  SELECT doc_id % 8 AS cls, count(*) AS m
  FROM documents WHERE doc_id < 200
  GROUP BY doc_id % 8
)
SELECT cls, CAST(m * (m - 1) / 2 AS BIGINT) AS n_pairs_phash,
       CAST(m * (m - 1) / 2 AS BIGINT) AS n_pairs_dhash
FROM members WHERE m >= 2 ORDER BY cls
"""


QUERIES["multimodal_phash_dedup"] = Query(
    multimodal_phash_dedup, MULTIMODAL_PHASH_ORACLE,
    ("multimodal", "dedup", "perceptual-hash"),
)


def multimodal_audio_dedup(spark, sf_dir):
    """Audio near-dedup end to end (pipeline/multimodal.py
    audio_fingerprints + the shared banded-hamming pairing): every doc
    synthesizes a REAL PCM16 WAV whose energy ENVELOPE class is
    doc_id % 6 — members differ by per-doc gain (amplitude × (1 + id%4))
    and the energy-delta fingerprint is gain-invariant by construction,
    so hamming-0 pairs per class are exactly C(m, 2); the oracle counts
    them combinatorially.  Faithful only if WAV encode → RIFF/PCM16
    decode → windowed energies → delta bits → band join → verify hold."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    assets = d.select(F.col("doc_id").alias("asset_id"))

    def _synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids = pdf["asset_id"]
            payloads = []
            for i in ids:
                i = int(i)
                cls, gain = i % 6, 1 + (i % 4)

                def s_fn(j, cls=cls, gain=gain):
                    # class envelope: amplitude steps in a per-class walk;
                    # 64 samples per fingerprint window (2048 total / 32)
                    step = (j // 64) % 7
                    amp = 500 * ((step * (cls + 2)) % 7 + 1)
                    return ((-1) ** j) * amp * gain

                payloads.append(multimodal.encode_wav(2048, 16000, s_fn))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    wavs = assets.mapInPandas(
        _synth,
        T.StructType(
            [
                T.StructField("asset_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    )
    hashed = multimodal.audio_fingerprints(wavs)
    pairs = multimodal.image_neardup_pairs(hashed, max_hamming=0)
    return (
        pairs.withColumn("cls", F.col("id_a") % 6)
        .groupBy("cls")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("cls")
    )


MULTIMODAL_AUDIO_ORACLE = """
WITH members AS (
  SELECT doc_id % 6 AS cls, count(*) AS m
  FROM documents WHERE doc_id < 150
  GROUP BY doc_id % 6
)
SELECT cls, CAST(m * (m - 1) / 2 AS BIGINT) AS n_pairs
FROM members WHERE m >= 2 ORDER BY cls
"""


QUERIES["multimodal_audio_dedup"] = Query(
    multimodal_audio_dedup, MULTIMODAL_AUDIO_ORACLE,
    ("multimodal", "dedup", "audio-fingerprint"),
)


def corpus_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    embedding near-dup pairs (bucketed k-means + per-bucket GEMM, never
    all-pairs) -> connected components (min-label propagation) -> one kept
    REPRESENTATIVE per semantic cluster, every other member pruned.  The
    deterministic keep rule is max(vec_id) per cluster (distinct from the
    min-id cluster label, so the rule is visibly a choice, not the label);
    singletons keep themselves.  Returns the per-vector dedup verdict the
    corpus build consumes.  The iterative component step is the
    transitive-closure fixpoint, replayed exactly by DuckDB's recursive
    CTE — full value-hash oracle despite the non-SQL Spark loop."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_dup_pairs(
        emb, threshold=0.4, n=parquet_num_rows(sf_dir, "embeddings")
    )
    cc = dedup.connected_components(pairs).withColumnRenamed(
        "doc_id", "vec_id"
    )
    j = emb.select("vec_id").join(cc, "vec_id", "left").select(
        "vec_id",
        F.coalesce(F.col("cluster_id"), F.col("vec_id")).alias("cluster_id"),
    )
    w = W.partitionBy("cluster_id")
    return j.select(
        "vec_id",
        "cluster_id",
        (F.col("vec_id") == F.max("vec_id").over(w)).alias("keep"),
    )


CORPUS_SEMDEDUP_ORACLE = f"""
WITH RECURSIVE epairs AS (
  SELECT id_a, id_b FROM ({DEDUP_EMB_ORACLE.strip()}) p
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM epairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM epairs
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach AS (
  SELECT id AS src, id AS dst FROM nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), cc AS (
  SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src
), verdicts AS (
  SELECT e.vec_id,
         coalesce(cc.cluster_id, e.vec_id) AS cluster_id
  FROM embeddings e LEFT JOIN cc ON cc.vec_id = e.vec_id
)
SELECT vec_id, cluster_id,
       vec_id = max(vec_id) OVER (PARTITION BY cluster_id) AS keep
FROM verdicts
"""


QUERIES["corpus_semantic_dedup"] = Query(
    corpus_semantic_dedup, CORPUS_SEMDEDUP_ORACLE,
    ("dedup", "similarity", "curation"),
)
