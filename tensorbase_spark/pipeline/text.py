"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All pure JVM expressions (regexp_count / array_intersect / aggregate) — no
Python in the row path, so these run at scan speed on any corpus size.  Every
heuristic is deterministic and mirrored exactly in the DuckDB oracle SQL in
queries/pipeline.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Whitespace tokens vs BPE-ish tokens (word pieces + isolated punctuation).
WORD_RE = r"\S+"
BPE_RE = r"\w+|[^\w\s]"

# Tiny per-language stopword profiles for the n-gram/stopword voting
# heuristic.  Deterministic; ties broken by language name order.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "en"),
    "zh": ("de", "shi", "le", "bu", "wo", "you", "he", "ren"),
}


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace word count + BPE-ish token count + char stats per doc."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars_obs"),
        F.regexp_count(t, F.lit(WORD_RE)).alias("n_words"),
        F.regexp_count(t, F.lit(BPE_RE)).alias("n_tokens"),
        F.size(F.array_distinct(F.array_remove(F.split(t, r"\s+"), ""))).alias("n_unique_words"),
    )


def quality_factors(text_col: str = "text") -> dict[str, F.Column]:
    """The unrounded factor Columns behind quality_scores — reusable inline
    so composed pipelines don't need a self-join to attach scores."""
    t = F.col(text_col)
    n_words = F.regexp_count(t, F.lit(WORD_RE)).cast("double")
    words = F.array_distinct(F.array_remove(F.split(t, r"\s+"), ""))
    uniq = F.size(words).cast("double")
    en_stops = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_hits = F.size(F.array_intersect(words, en_stops))
    length_factor = F.least(F.lit(1.0), n_words / F.lit(100.0))
    diversity = uniq / F.greatest(n_words, F.lit(1.0))
    stop_factor = F.least(F.lit(1.0), stop_hits.cast("double") / F.lit(3.0))
    score = F.lit(0.4) * length_factor + F.lit(0.3) * diversity + F.lit(0.3) * stop_factor
    return {
        "length_factor": length_factor,
        "diversity": diversity,
        "stop_factor": stop_factor,
        "quality": score,
    }


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality score in [0,1]:
    0.4 * length factor + 0.3 * lexical diversity + 0.3 * stopword presence.
    The shape mirrors standard LLM-corpus quality filters (length, diversity,
    stopword ratio)."""
    fs = quality_factors(text_col)
    length_factor, diversity = fs["length_factor"], fs["diversity"]
    stop_factor, score = fs["stop_factor"], fs["quality"]
    return docs.select(
        "doc_id",
        F.round(length_factor, 6).alias("length_factor"),
        F.round(diversity, 6).alias("diversity"),
        F.round(stop_factor, 6).alias("stop_factor"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile voting: predicted lang = argmax over profiles of
    distinct-word hits; ties break by lang code order.  Returns prediction
    next to the labeled lang for accuracy auditing."""
    words = F.array_distinct(F.array_remove(F.split(F.col(text_col), r"\s+"), ""))
    scores = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in prof])))
        for lang, prof in sorted(LANG_PROFILES.items())
    }
    # argmax with name-order tie-break: fold over langs keeping the best
    best = reduce(
        lambda acc, lang: F.when(scores[lang] > acc["s"], F.struct(scores[lang].alias("s"), F.lit(lang).alias("l"))).otherwise(acc),
        list(sorted(LANG_PROFILES))[1:],
        F.struct(
            scores[sorted(LANG_PROFILES)[0]].alias("s"),
            F.lit(sorted(LANG_PROFILES)[0]).alias("l"),
        ),
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best["l"].alias("pred_lang"),
        best["s"].alias("pred_hits"),
    )


def repetition_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style intra-document repetition filters (Rae et al. 2021,
    "Scaling Language Models", table A1 — public): duplicate-line fraction,
    duplicate-line CHARACTER fraction, and top word-2-gram fraction, with
    the paper's flag thresholds (0.30 / 0.18).

    Plan shape: BOTH metric families explode into map-side-combined counts —
    lines keyed (doc, line), bigrams keyed (doc, gram) — then reduce per
    doc.  Linear in corpus size, fully whole-stage-codegen.  (A first cut
    computed the line metrics as per-doc nested HOFs — zero shuffle but
    O(lines²) per doc in INTERPRETED CodegenFallback lambdas; measured 8.8 s
    at sf0.1 vs 1.3 s for this shape, and the gap widens with doc length.)
    No Python anywhere in the row path."""
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    ws = F.filter(
        F.split(F.regexp_replace(F.lower(t), "[^a-z0-9]+", " "), " "),
        lambda x: x != "",
    )
    # materialize the word array BEFORE building bigrams: an expression
    # referenced inside a HOF lambda is re-evaluated per element (no CSE
    # through lambda scopes), so an inline `ws` would re-run the regex split
    # once per word — O(words²) regex work, measured 8.2 s vs 0.5 s at sf0.1
    pre = docs.select("doc_id", lines.alias("_ls"), ws.alias("_ws"))
    w = F.col("_ws")
    n = F.size(w)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(w, F.lit(1), n - 1),
            F.slice(w, F.lit(2), n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = pre.select("doc_id", "_ls", bigrams.alias("_bgs"))

    line_stats = (
        base.select("doc_id", F.explode("_ls").alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_lines"),
            (F.lit(1.0) - F.count("*") / F.sum("c")).alias("_dlf"),
            (
                F.sum(F.when(F.col("c") > 1, F.length("line") * F.col("c")).otherwise(0))
                / F.sum(F.length("line") * F.col("c"))
            ).alias("_dlcf"),
        )
    )
    top = (
        base.select("doc_id", F.explode("_bgs").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("_tbf"))
    )
    joined = (
        base.select("doc_id")
        .join(line_stats, "doc_id", "left")
        .join(top, "doc_id", "left")
    )
    dlf = F.coalesce(F.col("_dlf"), F.lit(0.0))
    # a doc whose every line-char sum is 0 cannot occur (empty lines are
    # filtered), so _dlcf is NULL only for line-less docs
    dlcf = F.coalesce(F.col("_dlcf"), F.lit(0.0))
    tbf = F.coalesce(F.col("_tbf"), F.lit(0.0))
    return joined.select(
        "doc_id",
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("int").alias("n_lines"),
        F.round(dlf, 6).alias("dup_line_frac"),
        F.round(dlcf, 6).alias("dup_line_char_frac"),
        F.round(tbf, 6).alias("top_bigram_frac"),
        ((dlf > 0.3) | (tbf > 0.18)).alias("is_repetitive"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting:
    - content_md5: exact content fingerprint;
    - rolling_hash: 31-base polynomial rolling hash over the first 64
      character codepoints mod 2^31-1 (the classic Rabin-Karp shape) —
      computed with aggregate() over split characters, all JVM-side."""
    t = F.col(text_col)
    chars = F.slice(F.filter(F.split(t, ""), lambda c: c != ""), 1, 64)
    rolling = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(2147483647),
    )
    return docs.select(
        "doc_id",
        F.md5(t).alias("content_md5"),
        rolling.alias("rolling_hash"),
    )


# PII patterns kept engine-portable (no lookarounds, no \b edge semantics
# differences): email, international-ish phone, 13-19 digit card runs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9 ()-]{6,}[0-9]"
PII_CARD_RE = r"[0-9]{13,19}"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII scrubbing — email -> <EMAIL>, phone -> <PHONE>, long digit
    runs -> <NUM> — plus whitespace normalization.  All regexp_replace, so
    the whole pass is one codegen'd projection: at 100 TB this is a
    map-only stage with zero shuffle, the cheapest possible shape.

    Order matters: emails first (their local part may contain digits), then
    contiguous 13-19 digit card runs (the looser phone pattern would consume
    them), then phones."""
    t = F.col(text_col)
    r1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    r2 = F.regexp_replace(r1, PII_CARD_RE, "<NUM>")
    r3 = F.regexp_replace(r2, PII_PHONE_RE, "<PHONE>")
    red = F.trim(F.regexp_replace(r3, r"\s+", " "))
    # count the matches each stage actually replaced — counting tag strings
    # in the output would miscount documents that already contain the
    # literal markers (e.g. a re-ingested, previously-redacted corpus)
    n = (
        F.regexp_count(t, F.lit(PII_EMAIL_RE))
        + F.regexp_count(r1, F.lit(PII_CARD_RE))
        + F.regexp_count(r2, F.lit(PII_PHONE_RE))
    )
    return docs.withColumn("redacted", red).withColumn("n_redactions", n.cast("int"))


def chunk_documents(
    docs: DataFrame, text_col: str = "text", size: int = 50, overlap: int = 10
) -> DataFrame:
    """Sliding-window document chunking: word windows of `size` tokens with
    `overlap` tokens of context between consecutive chunks — the standard
    long-document -> training-sequence splitter.

    Pure JVM: split -> sequence/explode over chunk starts -> slice.  Chunk
    count per doc is ceil((n_words - overlap) / stride) (min 1), so output
    volume scales with corpus token count, not doc count; the explode is
    generator-codegen (no shuffle), and downstream ops see chunks as ordinary
    rows.  At 100 TB this stage is map-only."""
    stride = size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than size")
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.size(w) - F.lit(overlap)) / F.lit(stride)).cast("long")
    )
    d = docs.withColumn("__w", w).withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    chunk_words = F.slice(F.col("__w"), F.col("chunk_idx") * stride + 1, size)
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(chunk_words, " ").alias("chunk"),
        F.size(chunk_words).alias("n_tokens"),
    )


URL_RE = r"https?://[^\s]+"
URL_HOST_RE = r"^https?://([^/\s]+)"


def url_extract(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """URL + domain extraction: (doc_id, url, host) one row per URL found.

    The standard pretraining-pipeline signal for domain-level filtering,
    URL dedup, and per-host quota capping.  Pure built-in expressions
    (regexp_extract_all + explode + regexp_extract) — whole-stage codegen,
    no Python; at 100 TB the explode fans out by URLs-per-doc (bounded),
    and the usual downstream groupBy(host) shuffles on a key whose skew
    (mega-hosts) AQE splits."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
    return (
        docs.select("doc_id", F.explode(urls).alias("url"))
        .withColumn("host", F.regexp_extract("url", URL_HOST_RE, 1))
    )


def host_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-host URL counts over the corpus — the aggregation that feeds
    domain quotas and blocklists."""
    return (
        url_extract(docs, text_col)
        .groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("url").alias("n_unique_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def unigram_logprob(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-unigram-LM document scoring — the classic cheap perplexity
    proxy for pretraining-data quality filtering (rare-word-heavy or
    garbled docs score low; boilerplate scores high).

    Two-phase, all JVM:
    1. vocab: explode whitespace tokens -> groupBy(token).count() plus the
       corpus total (one shuffle on token; partial aggregation makes the
       exchange proportional to VOCABULARY size, not corpus size).
    2. score: re-explode tokens, join the vocab (token-key equi-join —
       Zipfian skew on hot tokens is exactly what AQE skew splitting
       handles), then avg(ln(count/total)) per doc.

    OOV is impossible by construction (vocab comes from the scored corpus).
    The vocab join deliberately carries NO broadcast hint: a whitespace
    vocabulary over 100 TB of web text (URLs, numbers, typos — Heaps' law)
    runs to 1e9+ rows, past Spark's 8 GB broadcast hard limit, and a forced
    hint would OOM the driver instead of degrading.  Catalyst/AQE picks
    broadcast while the vocab fits ``autoBroadcastJoinThreshold`` and falls
    back to a skew-split sort-merge join when it doesn't — the token stream
    is never shuffled by doc until the final per-doc aggregate.
    """
    toks = docs.select(
        F.col(key),
        F.explode(F.array_remove(F.split(F.col(text_col), r"\s+"), "")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("tok_n"))
    total = vocab.agg(F.sum("tok_n").alias("corpus_n"))
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(key)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("tok_n") / F.col("corpus_n"))), 4).alias(
                "avg_logprob"
            ),
        )
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    sample_size: int = 2048,
) -> list[tuple[str, str]]:
    """Deterministic byte-pair-encoding training (Sennrich et al. 2016,
    public): collect a bounded hash-ordered text sample driver-side (the
    same convention as centroid/codebook training — at 100 TB you train the
    tokenizer on a sample and broadcast it, never on the corpus), build a
    word-frequency table, then greedily merge the most frequent symbol pair
    ``n_merges`` times.  Ties break lexicographically — no seeds, the same
    merge list every run."""
    import re as _re

    rows = (
        docs.select(F.col("doc_id").alias("i"), F.col(text_col).alias("t"))
        .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
        .limit(sample_size)
        .collect()
    )
    freq: dict[tuple[str, ...], int] = {}
    for r in rows:
        for w in _re.findall(r"[a-z0-9]+", (r.t or "").lower()):
            sym = tuple(w) + ("</w>",)
            freq[sym] = freq.get(sym, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in freq.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # max count, ties -> lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_freq: dict[tuple[str, ...], int] = {}
        for sym, n in freq.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_freq[t] = new_freq.get(t, 0) + n
        freq = new_freq
    return merges


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained BPE merge list to every document (GPT-2-style greedy
    rank application per word) and return per-doc token statistics.  One
    Arrow-batched pass; the merge table rides the closure (KBs).  Python is
    justified here the same way the MinHash signatures are: the inner loop
    is a data-dependent while-loop over symbol sequences that no JVM
    expression expresses; everything around it stays in the JVM."""
    import re as _re

    import pandas as pd
    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(w: str, cache: dict) -> int:
        hit = cache.get(w)
        if hit is not None:
            return hit
        sym = list(w) + ["</w>"]
        while len(sym) > 1:
            best, bi = None, -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            sym[bi : bi + 2] = [sym[bi] + sym[bi + 1]]
        cache[w] = len(sym)
        return len(sym)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_words", T.IntegerType()),
            T.StructField("n_bpe_tokens", T.IntegerType()),
        ]
    )

    def _scan(batches):
        cache: dict[str, int] = {}
        for pdf in batches:
            ids, nw, nt = [], [], []
            for i, t in zip(pdf["doc_id"], pdf[text_col]):
                words = _re.findall(r"[a-z0-9]+", (t or "").lower())
                ids.append(i)
                nw.append(len(words))
                nt.append(sum(_encode_word(w, cache) for w in words))
            yield pd.DataFrame({"doc_id": ids, "n_words": nw, "n_bpe_tokens": nt})

    return docs.select("doc_id", text_col).mapInPandas(_scan, schema=out_schema)


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    onepass_max_terms: int = 64,
    n_docs: int | None = None,
) -> DataFrame:
    """Distributed BM25 retrieval (Robertson/Spärck Jones; the lexical
    ranking half of every RAG / retrieval-curation pipeline): top-k
    documents per query string.

    Plan shape at 100 TB: tokenize map-side (split, JVM), tf and df
    restricted to the BROADCAST query terms before their keyed shuffles
    (candidate rows ∝ docs containing a query term, never corpus ×
    queries), dl/avgdl as map-side-combined per-doc partials + a 1-row
    broadcast, and a top-k window per query.  Nothing touches Python.
    (A zero-shuffle variant computing every per-term tf in one
    F.aggregate pass over the token array was built and measured 1.7-2.4×
    SLOWER at sf0.1: nested HOF lambdas run interpreted, outside
    whole-stage codegen — the explode plan stays codegen'd end to end.
    PLANS.md §13.)
    """
    from tensorbase_spark.pipeline.similarity import _spread

    spark = docs.sparkSession
    # r15: the tokenize -> explode -> per-doc aggregation is the heavy
    # stage of both BM25 paths, and on the single-file fixture layouts it
    # ran as ONE scan task (same starvation the similarity family had —
    # see similarity._spread).  The spread is gated on actual scan
    # partitions, so it is a no-op on multi-file corpora; per-doc counts
    # and dl sums are integer-exact in doubles, so results are identical
    # under any partitioning (oracle hash-green at sf0.01/sf0.1).
    docs = _spread(docs.select("doc_id", text_col), "doc_id", n_docs,
                   rows_per_task=1000)
    term_lists = [(qid, list(dict.fromkeys(qs.lower().split()))) for qid, qs in queries]
    all_terms = sorted({t for _, ts in term_lists for t in ts})
    if all_terms and len(all_terms) <= onepass_max_terms:
        # Small fixed query vocabularies (the retrieval-curation norm: a
        # handful of probe queries) take the ONE-PASS path: the r14 plan
        # audit showed this function scanning + re-tokenizing the corpus
        # FOUR times (tf branch, dfreq branch, dl branch, stats branch —
        # each its own Generate over the full token stream).  One
        # doc-keyed aggregation with a conditional-sum column per query
        # term computes tf AND dl together; corpus stats (avgdl, n_docs,
        # df per term) come off the persisted per-doc table in one tiny
        # job, and scores are a fixed JVM expression over the wide
        # columns — one corpus tokenize per run, one map-side-combined
        # shuffle whose rows are n_docs, not n_tokens (guide §2.3/§2.4).
        return _bm25_topk_onepass(
            docs, term_lists, all_terms, k, k1, b, text_col
        )
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in term_lists for t in ts],
        "q_id long, term string",
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("term"),
    )
    # dl/avgdl need every token; tf and df only need QUERY terms — the
    # broadcast semi-restriction happens before the keyed shuffle, so the
    # expensive aggregations run over candidate rows, not the corpus
    qterms = qdf.select("term").distinct()
    toks_q = toks.join(F.broadcast(qterms), "term")
    tf = toks_q.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").cast("double").alias("n_docs")
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("q_id", "doc_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "doc_id", "rank", "score")
    )


def _bm25_topk_onepass(
    docs: DataFrame,
    term_lists: list[tuple[int, list[str]]],
    all_terms: list[str],
    k: int,
    k1: float,
    b: float,
    text_col: str,
) -> DataFrame:
    """One-corpus-pass BM25 for bounded query vocabularies (see bm25_topk).

    Results are identical to the general path: tf per (doc, term) becomes a
    conditional sum column, dl rides the same aggregation, df/avgdl/n_docs
    are exact corpus stats read off the persisted per-doc table, and the
    idf/weight arithmetic is the same JVM double expression (F.log), so the
    only difference is double-summation order inside a round(…, 6) — the
    registry's documented hash-stability convention."""
    from pyspark.storagelevel import StorageLevel

    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("term"),
    )
    tf_cols = [
        F.sum(F.when(F.col("term") == F.lit(t), 1).otherwise(0))
        .cast("long")
        .alias(f"__tf{i}")
        for i, t in enumerate(all_terms)
    ]
    perdoc = (
        toks.groupBy("doc_id")
        .agg(F.count("*").alias("dl"), *tf_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # corpus stats in ONE job off the cached per-doc table: avgdl, n_docs
    # (docs with >= 1 token, matching the general path's dl-table count),
    # and per-term document frequencies
    srow = perdoc.agg(
        F.avg("dl").alias("avgdl"),
        F.count("*").cast("double").alias("n_docs"),
        *[
            F.sum(F.when(F.col(f"__tf{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"__df{i}")
            for i in range(len(all_terms))
        ],
    ).collect()[0]
    avgdl, n_docs = float(srow.avgdl), float(srow.n_docs)
    term_idx = {t: i for i, t in enumerate(all_terms)}

    def _weight(i: int) -> F.Column:
        tf = F.col(f"__tf{i}").cast("double")
        # idf stays a JVM log over literal stats — bit-identical to the
        # general path's expression on the broadcast-joined stats
        idf = F.log(
            (F.lit(n_docs) - F.lit(float(srow[f"__df{i}"])) + 0.5)
            / (F.lit(float(srow[f"__df{i}"])) + 0.5)
            + 1.0
        )
        denom = tf + k1 * (1 - b + b * F.col("dl").cast("double") / F.lit(avgdl))
        return idf * (tf * (k1 + 1)) / denom  # tf = 0 contributes exactly 0

    per_query = []
    for qid, ts in term_lists:
        idxs = [term_idx[t] for t in ts]
        if not idxs:
            # a query whose string tokenizes to zero terms returns no rows
            # on the general path; building F.round(None, 6) here would
            # raise at plan build (ADVICE r14) — skip it the same way
            continue
        score = None
        matched = None
        for i in idxs:
            w_i = _weight(i)
            score = w_i if score is None else score + w_i
            m_i = F.col(f"__tf{i}") > 0
            matched = m_i if matched is None else matched | m_i
        per_query.append(
            F.struct(
                F.lit(qid).cast("long").alias("q_id"),
                F.round(score, 6).alias("score"),
                matched.alias("__m"),
            )
        )
    scored = (
        perdoc.select("doc_id", F.explode(F.array(*per_query)).alias("qs"))
        .select("doc_id", F.col("qs.q_id").alias("q_id"),
                F.col("qs.score").alias("score"), F.col("qs.__m").alias("__m"))
        # only docs containing >= 1 query term rank, exactly like the
        # general path (absent tf rows there == unmatched docs here)
        .filter(F.col("__m"))
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "doc_id", "rank", "score")
    )


def ngram_novelty(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT word
    n-grams whose first corpus occurrence (min doc_id) is this doc — the
    content-freshness signal incremental corpus builds rank new crawls by.
    Two keyed shuffles (per-gram min, per-doc re-aggregate); gram
    generation is a map-side JVM transform over the token array."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    # guard: sequence(1, 0) DESCENDS in Spark — docs with < n words must
    # yield no grams, not a bogus [1, 0] index walk
    grams = (
        docs.select("doc_id", words.alias("__w"))
        .filter(F.size("__w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("__w") - (n - 1)),
                        lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i, n)),
                    )
                )
            ).alias("gram"),
        )
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
        )
    )


def substring_window_dupes(
    docs: DataFrame, win: int = 40, stride: int = 10, text_col: str = "text"
) -> DataFrame:
    """Window-granular exact-substring duplication (the scalable stand-in
    for suffix-array substring dedup, Lee et al. 2022 'Deduplicating
    Training Data Makes Language Models Better'): slide fixed-size char
    windows with a stride, hash each, and report per-doc how many of its
    windows also occur verbatim in ANOTHER doc.  One shuffle on the
    window hash (count distinct docs per window), one per-doc
    re-aggregate; window generation is map-side."""
    t = F.col(text_col)
    wins = docs.filter(F.length(t) >= win).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - (win - 1), F.lit(stride)),
                    lambda i: F.md5(t.substr(i, F.lit(win))),
                )
            )
        ).alias("wh"),
    )
    shared = wins.groupBy("wh").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    return (
        wins.join(shared, "wh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum((F.col("n_docs_with") > 1).cast("long")).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_windows"), 6).alias(
                "dup_fraction"
            ),
        )
    )


def zipf_stats(
    docs: DataFrame, top_n: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Corpus Zipf statistics: the least-squares slope/intercept of
    ln(freq) on ln(rank) over the top-``top_n`` tokens, plus vocab/token
    totals — the standard one-number corpus-health probe (natural text
    sits near slope -1; templated or synthetic corpora drift off it; a
    pre/post-dedup slope shift flags boilerplate removal).

    Plan: token explode map-side, ONE keyed shuffle for the frequency
    table, a distributed top-k (orderBy+limit = TakeOrdered — never a
    global sort), then the regression over top_n rows via covar_pop/
    var_pop — driver never sees more than the single result row.
    Rank ties share a frequency, so the (rank, freq) multiset — and the
    slope — is tie-order invariant."""
    toks = docs.select(
        F.explode(
            F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("n"))
    totals = freq.agg(
        F.count("*").alias("vocab_size"),
        F.sum("n").alias("n_tokens"),
    )
    top = freq.orderBy(F.col("n").desc(), "tok").limit(top_n)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("n").desc(), "tok")),
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    reg = ranked.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("__slope"),
        F.avg("x").alias("__mx"),
        F.avg("y").alias("__my"),
        F.count("*").alias("n_ranked"),
    ).select(
        F.round("__slope", 6).alias("zipf_slope"),
        F.round(F.col("__my") - F.col("__slope") * F.col("__mx"), 6).alias(
            "zipf_intercept"
        ),
        "n_ranked",
    )
    return reg.crossJoin(F.broadcast(totals))


def gopher_quality_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality-filter rule set (Rae et al. 2021, table A1 — public;
    also the FineWeb/Dolma default gate): per-document boolean verdicts for
    each rule plus the conjunction ``keep``.

    Rules: word count in [min,max]; mean word length in [3,10]; symbol
    ('#'/'...') to word ratio <= 0.1; <= 90% of lines bullet-led; <= 30%
    of lines ellipsis-terminated; >= 80% of words contain an alphabetic
    character; >= 2 distinct English stopwords present.

    Every rule is a codegen'd expression over split/regexp counts — the
    whole operator is ONE map-only projection, zero shuffles, the cheapest
    possible 100 TB shape (same class as quality_scores).  Ratio
    comparisons divide identical integer counts on both engines, so the
    IEEE doubles — and the verdicts — are bit-identical cross-engine."""
    t = F.col(text_col)
    words = F.array_remove(F.split(t, r"\s+"), "")
    n_words = F.size(words).cast("double")
    # mean word length over the words themselves (not raw chars: separators
    # would dilute it)
    sum_wl = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    mean_wl = sum_wl / F.greatest(n_words, F.lit(1.0))
    n_symbols = (F.regexp_count(t, F.lit(r"#")) + F.regexp_count(t, F.lit(r"\.\.\."))).cast("double")
    lines = F.array_remove(F.transform(F.split(t, r"\n"), lambda x: F.trim(x)), "")
    n_lines = F.size(lines).cast("double")
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike(r"^[-*•]"))).cast("double")
    n_ellip = F.size(F.filter(lines, lambda x: x.rlike(r"\.\.\.$"))).cast("double")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))).cast("double")
    en_stops = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(words), en_stops))
    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mean_wl = (mean_wl >= min_mean_wl) & (mean_wl <= max_mean_wl)
    r_symbol = n_symbols / F.greatest(n_words, F.lit(1.0)) <= max_symbol_ratio
    r_bullet = n_bullet / F.greatest(n_lines, F.lit(1.0)) <= max_bullet_ratio
    r_ellipsis = n_ellip / F.greatest(n_lines, F.lit(1.0)) <= max_ellipsis_ratio
    r_alpha = n_alpha / F.greatest(n_words, F.lit(1.0)) >= min_alpha_ratio
    r_stops = stop_hits >= min_stop_hits
    keep = r_words & r_mean_wl & r_symbol & r_bullet & r_ellipsis & r_alpha & r_stops
    as_int = lambda c: c.cast("int")  # noqa: E731 — hash-stable driver dtype
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        as_int(r_words).alias("r_words"),
        as_int(r_mean_wl).alias("r_mean_wl"),
        as_int(r_symbol).alias("r_symbol"),
        as_int(r_bullet).alias("r_bullet"),
        as_int(r_ellipsis).alias("r_ellipsis"),
        as_int(r_alpha).alias("r_alpha"),
        as_int(r_stops).alias("r_stops"),
        as_int(keep).alias("keep"),
    )


def c4_line_clean(
    docs: DataFrame, text_col: str = "text", min_line_words: int = 5
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2 — public):
    keep only lines that terminate in sentence punctuation AND carry at
    least ``min_line_words`` words; drop the whole document when it
    contains 'lorem ipsum' or a '{' (code/boilerplate tell).

    Pure JVM: split -> filter HOF -> array_join; one map-only projection,
    zero shuffles.  Documents emptied by the line filter survive as rows
    with clean_text='' and n_kept=0 so the caller decides retention —
    dropping them silently here would hide the filter's aggressiveness."""
    t = F.col(text_col)
    lines = F.array_remove(F.transform(F.split(t, r"\n"), lambda x: F.trim(x)), "")
    kept = F.filter(
        lines,
        lambda x: x.rlike(r"[.!?\"']$")
        & (F.size(F.array_remove(F.split(x, r"\s+"), "")) >= min_line_words),
    )
    doc_bad = F.lower(t).contains("lorem ipsum") | t.contains("{")
    kept = F.when(doc_bad, F.array().cast("array<string>")).otherwise(kept)
    return docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        doc_bad.cast("int").alias("doc_dropped"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def boilerplate_lines(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Within-group boilerplate detection: a line is boilerplate when it
    appears in >= ``min_docs`` DISTINCT documents of the same group
    (site/domain/source) — headers, footers, nav chrome; the standard
    pre-dedup cleanup for scraped corpora.

    Plan: explode to (group, line-hash, doc) map-side — the shuffle
    carries 64-bit hashes, never line text — ONE keyed shuffle for the
    distinct-doc census, then the verdicts broadcast-or-shuffle-join back
    onto the doc's line set by hash.  Candidates ∝ distinct lines per
    group, not corpus size; at 100 TB the census output is the boilerplate
    vocabulary (small by construction), so the join-back side is the only
    data-sized pass."""
    g, t = F.col(group_col), F.col(text_col)
    lines = F.array_distinct(
        F.array_remove(F.transform(F.split(t, r"\n"), lambda x: F.trim(x)), "")
    )
    ex = docs.select(g.alias("grp"), F.col("doc_id"), F.explode(lines).alias("line"))
    ex = ex.withColumn("lh", F.xxhash64("line"))
    census = (
        ex.groupBy("grp", "lh")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("grp", "lh", F.lit(1).alias("is_bp"))
    )
    flagged = (
        ex.join(census, ["grp", "lh"], "left")
        .groupBy("grp", "doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.coalesce(F.col("is_bp"), F.lit(0))).alias("n_boilerplate"),
        )
    )
    return flagged.select(
        F.col("grp").alias(group_col),
        "doc_id",
        "n_lines",
        F.col("n_boilerplate").cast("long").alias("n_boilerplate"),
    )


def html_to_text(docs: DataFrame, html_col: str = "text") -> DataFrame:
    """HTML → text extraction, regex tier (the first pass of every web
    pretraining pipeline; trafilatura/jusText refine with DOM heuristics,
    this is the boilerplate-strip core): drop script/style/head/noscript
    blocks and comments, convert the block-level closers to newlines,
    strip remaining tags, decode the common entities, collapse horizontal
    whitespace, trim line edges.

    All regexp_replace — one codegen'd map-only projection, zero
    shuffles, the cheapest 100 TB shape.  Patterns avoid backreferences
    and use only RE2-compatible syntax so any verifier (DuckDB, RE2
    services) replays them exactly."""
    r = F.col(html_col)
    for blk in ("script", "style", "head", "noscript"):
        r = F.regexp_replace(r, rf"(?is)<{blk}[^>]*>.*?</{blk}>", " ")
    r = F.regexp_replace(r, r"(?s)<!--.*?-->", " ")
    r = F.regexp_replace(
        r, r"(?i)<br[^>]*>|</p>|</div>|</li>|</h[1-6]>|</tr>", "\n"
    )
    r = F.regexp_replace(r, r"<[^>]*>", " ")
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),  # amp LAST
    ):
        r = F.replace(r, F.lit(ent), F.lit(ch))
    r = F.regexp_replace(r, r"[ \t]+", " ")
    r = F.regexp_replace(r, r" ?\n ?", "\n")
    r = F.regexp_replace(r, r"\n{2,}", "\n")
    # trim() is space-only in both engines; edge newlines need the regex
    r = F.regexp_replace(r, r"^\n+|\n+$", "")
    r = F.trim(r)
    return docs.withColumn("clean_text", r).withColumn(
        "n_clean_chars", F.length("clean_text")
    )
