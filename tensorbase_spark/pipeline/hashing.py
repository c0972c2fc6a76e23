"""Arrow-vectorized text hashing for the dedup operators.

Why pandas UDFs and not pure Column expressions: the shingle/bigram pipelines
were first written JVM-side (split + zip_with + concat_ws + xxhash64).  Those
higher-order functions are CodegenFallback — evaluated interpreted, per
element, inside whichever operator Catalyst inlines them into — and measured
wall time for the same plan varied up to 40x run-to-run with C2 JIT profile
luck (a deopt storm on the interpreted eval path slows the WHOLE JVM, which
on local[32] also taxes every later query in the session).  An Arrow-batched
pandas UDF has none of that: the text column arrives as one Arrow batch per
~10k rows, tokenization is plain Python/C (str.split + zlib.crc32), the
MinHash matrix math is numpy, and the cost is flat and deterministic.  At
100 TB this is also the right shape — the UDF is embarrassingly parallel per
batch and the per-row Python overhead is amortized by Arrow batching.

Hash design (deterministic, engine-independent — NO runtime randomness):
- h64(s): two salted zlib.crc32 passes packed into a positive int64.
  Injective-in-practice on real shingle sets: a collision flips one Jaccard
  count with probability ~2^-63 per pair, which keeps hash-set Jaccard equal
  to string-set Jaccard (the DuckDB oracle for ngram_jaccard computes the
  string form and hash-matches).
- base31(s) = h64(s) % (2^31 - 1): the MinHash domain, matching the classic
  (a*h + b) mod p universal-hash family with p = 2^31-1; products stay under
  2^62 so the numpy int64 math never overflows.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

_MERSENNE = 2147483647  # 2^31 - 1

# Deterministic per-hash-function coefficients (a_i, b_i) from a fixed LCG —
# reproducible across runs, engines and cluster sizes.
N_HASHES = 96
N_BANDS = 24
ROWS_PER_BAND = 4


def _lcg_pairs(n: int, seed: int = 42) -> list[tuple[int, int]]:
    out = []
    x = seed
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = x | 1  # odd, nonzero
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x
        out.append((a, b))
    return out


_COEFFS = _lcg_pairs(N_HASHES)
_A = np.array([a for a, _ in _COEFFS], dtype=np.int64)[:, None]  # (96, 1)
_B = np.array([b for _, b in _COEFFS], dtype=np.int64)[:, None]

_WS = re.compile(r"\s+")

SHINGLE_N = 3


def h64_bytes(b: bytes) -> int:
    """Positive-int64 hash: two salted crc32 passes, high bit masked off."""
    hi = zlib.crc32(b, 0x9E3779B9) & 0x7FFFFFFF
    lo = zlib.crc32(b, 0x85EBCA6B) & 0xFFFFFFFF
    return (hi << 32) | lo


def shingle_strings(text: str, n: int = SHINGLE_N) -> list[str]:
    """n-word shingles, mirroring the Column-side definition in dedup.py:
    regex-\\s+ split, fallback to [text] for docs shorter than n words.
    NOT deduplicated — callers that need sets dedupe the hashes."""
    w = _WS.split(text)
    if len(w) >= n:
        return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    return [text]


def _shingle_h64(text: str) -> np.ndarray:
    return np.fromiter(
        (h64_bytes(s.encode("utf-8", "surrogatepass")) for s in shingle_strings(text)),
        dtype=np.int64,
    )


@pandas_udf(ArrayType(LongType()))
def shingle_hash_set(texts: pd.Series) -> pd.Series:
    """Distinct 64-bit shingle hashes per document (exact-Jaccard verify set)."""
    return pd.Series([np.unique(_shingle_h64(t if t is not None else "")) for t in texts])


@pandas_udf(ArrayType(LongType()))
def minhash_signature(texts: pd.Series) -> pd.Series:
    """96-element MinHash signature per document.

    s_i = min over distinct shingles of (a_i * base31(shingle) + b_i) mod p.
    The (96, n_shingles) matrix per doc is tiny (n ~ doc words); numpy does
    the whole batch at C speed with no interpreted-expression involvement."""
    out = []
    for t in texts:
        hs = np.unique(_shingle_h64(t if t is not None else "")) % _MERSENNE  # (n,)
        sig = (_A * hs[None, :] + _B) % _MERSENNE  # (96, n), products < 2^62
        out.append(sig.min(axis=1))
    return pd.Series(out)


_FEATURES_SCHEMA = StructType(
    [
        StructField("sig", ArrayType(LongType())),
        StructField("toks", ArrayType(LongType())),
    ]
)


@pandas_udf(_FEATURES_SCHEMA)
def minhash_features(texts: pd.Series) -> pd.DataFrame:
    """MinHash signature AND the distinct shingle-hash verify set in ONE
    shingling pass — bitwise identical to minhash_signature +
    shingle_hash_set run separately, at half the tokenization cost and
    (with the caller persisting the result) a third of the Arrow passes:
    the LSH pipeline needs the toks column in BOTH verify-join branches,
    which would otherwise recompute the UDF per branch."""
    sigs, toks = [], []
    for t in texts:
        hs = np.unique(_shingle_h64(t if t is not None else ""))
        toks.append(hs)
        m = hs % _MERSENNE
        sigs.append(((_A * m[None, :] + _B) % _MERSENNE).min(axis=1))
    return pd.DataFrame({"sig": sigs, "toks": toks})


@pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """63-bit SimHash per document (bit 63 clear: stays positive in a long).

    Bit j of the fingerprint = sign of sum over distinct shingles of
    (+1 if hash bit j set else -1)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        hs = np.unique(_shingle_h64(t if t is not None else ""))
        bits = (hs[:, None] >> np.arange(63)[None, :]) & 1  # (n, 63)
        votes = bits.sum(axis=0) * 2 - len(hs)  # (+1/-1 sums)
        fp = np.uint64(0)
        for j in np.nonzero(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(j)
        out[i] = np.int64(fp)
    return pd.Series(out)


def word_ngram_hash_set(n: int):
    """Factory: pandas UDF producing the DISTINCT 64-bit hashes of
    single-space word n-grams per document (empty array below n words) —
    the same gram definition as the curation oracle's
    string_split(text, ' ') + array_to_string(w[i:i+n-1], ' ') (split on the
    literal space KEEPING empties, join with a single space).  Counting
    shared hashes == counting shared gram strings modulo a ~2^-64-per-pair
    collision."""

    @pandas_udf(ArrayType(LongType()))
    def _grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            w = (t if t is not None else "").split(" ")
            if len(w) < n:
                out.append(np.array([], dtype=np.int64))
                continue
            seen = {
                h64_bytes((" ".join(w[i : i + n])).encode("utf-8", "surrogatepass"))
                for i in range(len(w) - n + 1)
            }
            out.append(np.fromiter(seen, dtype=np.int64))
        return pd.Series(out)

    return _grams


@pandas_udf(ArrayType(LongType()))
def bigram_hash_set(texts: pd.Series) -> pd.Series:
    """Distinct 64-bit hashes of single-space word bigrams — EXACTLY the
    bigram definition of the ngram_jaccard DuckDB oracle (split on the
    literal ' ' keeping empties; w[i] + ' ' + w[i+1]); empty array for docs
    under two words, so those never contribute to |intersect| or |union|.

    CONTRACT (r15): the array is SORTED ASCENDING.  ngram_jaccard_pairs'
    hash-order prefix path slices the first floor((1-t)|bg|)+1 elements
    directly off it — the r14 plan ran an array_sort with an interpreted
    lambda comparator inside BOTH self-join Generate branches, i.e. two
    comparison-at-a-time sorts per doc per run, where one vectorized
    np.sort in the Arrow pass that already builds the array does the same
    work once (guide §4.2).  Jaccard itself (array_intersect/array_union)
    and the df-order prefix UDF are order-insensitive, so results are
    identical."""
    out = []
    for t in texts:
        w = (t if t is not None else "").split(" ")
        if len(w) < 2:
            out.append(np.array([], dtype=np.int64))
            continue
        seen = {
            h64_bytes((w[i] + " " + w[i + 1]).encode("utf-8", "surrogatepass"))
            for i in range(len(w) - 1)
        }
        out.append(np.sort(np.fromiter(seen, dtype=np.int64)))
    return pd.Series(out)
