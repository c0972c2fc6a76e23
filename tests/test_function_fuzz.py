"""Golden-fuzz parity for the algorithmic dialect functions.

Seeded random inputs (deterministic run-to-run) ride through ONE Spark
query per family as a VALUES table; the results are compared against
independent pure-Python reference implementations of the published
algorithms.  This catches edge cases hand-picked goldens miss — window
clamps in Jaro, transposition reach-back in Damerau-Levenshtein, zero
bytes and carry chains in base58, 32-bit wraps in javaHash, the
early-exit guard in jumpConsistentHash."""

from __future__ import annotations

import math
import random

_ALPHA = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


# --- pure-Python references (published algorithms, written independently
# of the SQL templates) -------------------------------------------------

def _ref_jaro(s1: str, s2: str) -> float:
    if not s1 or not s2:
        return 0.0
    la, lb = len(s1), len(s2)
    win = max(max(la, lb) // 2 - 1, 0)
    used = [False] * lb
    m1, mj = [], []
    for i in range(la):
        for j in range(max(0, i - win), min(lb, i + win + 1)):
            if not used[j] and s2[j] == s1[i]:
                used[j] = True
                m1.append(s1[i])
                mj.append(j)
                break
    if not m1:
        return 0.0
    m2 = [s2[j] for j in sorted(mj)]
    t = sum(1 for x, y in zip(m1, m2) if x != y) // 2
    m = len(m1)
    return (m / la + m / lb + (m - t) / m) / 3


def _ref_jaro_winkler(s1: str, s2: str) -> float:
    j = _ref_jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * 0.1 * (1 - j)


def _ref_damerau(s1: str, s2: str) -> int:
    la, lb = len(s1), len(s2)
    if not la or not lb:
        return la + lb
    maxd = la + lb
    da: dict[str, int] = {}
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(s2[j - 1], 0)
            l = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[s1[i - 1]] = i
    return d[la + 1][lb + 1]


def _ref_base58(b: bytes) -> str:
    n = int.from_bytes(b, "big") if b else 0
    out = ""
    while n > 0:
        n, r = divmod(n, 58)
        out = _ALPHA[r] + out
    pad = len(b) - len(b.lstrip(b"\x00"))
    return "1" * pad + out


def _ref_javahash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def _ref_jumphash(key: int, n: int) -> int:
    key &= (1 << 64) - 1
    b, j = -1, 0
    while j < n:
        b = j
        key = (key * 2862933555777941757 + 1) & ((1 << 64) - 1)
        j = int(float(b + 1) * (float(1 << 31) / float((key >> 33) + 1)))
    return b


def _ref_byte_hamming(a: str, b: str) -> int:
    ba, bb = a.encode(), b.encode()
    n = min(len(ba), len(bb))
    return sum(1 for i in range(n) if ba[i] != bb[i]) + abs(
        len(ba) - len(bb)
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _batch(spark, exprs: list[str]):
    """One SELECT evaluating every fuzz expression JVM-side."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    cols = ", ".join(f"{e} as c{i}" for i, e in enumerate(exprs))
    return list(eng.sql(f"select {cols}").collect()[0])


def test_fuzz_jaro_family(spark):
    rng = random.Random(42)
    pairs = []
    for _ in range(60):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        s1 = "".join(rng.choice("abcABC12 -") for _ in range(n1))
        s2 = "".join(rng.choice("abcABC12 -") for _ in range(n2))
        pairs.append((s1, s2))
    exprs = []
    for s1, s2 in pairs:
        exprs.append(f"jaroSimilarity({_sql_str(s1)}, {_sql_str(s2)})")
        exprs.append(
            f"jaroWinklerSimilarity({_sql_str(s1)}, {_sql_str(s2)})"
        )
    got = _batch(spark, exprs)
    for idx, (s1, s2) in enumerate(pairs):
        assert math.isclose(
            got[2 * idx], _ref_jaro(s1, s2), abs_tol=1e-12
        ), (s1, s2, got[2 * idx], _ref_jaro(s1, s2))
        assert math.isclose(
            got[2 * idx + 1], _ref_jaro_winkler(s1, s2), abs_tol=1e-12
        ), (s1, s2)


def test_fuzz_damerau_levenshtein(spark):
    rng = random.Random(43)
    pairs = []
    for _ in range(50):
        n1, n2 = rng.randint(0, 10), rng.randint(0, 10)
        # a SMALL alphabet maximizes transposition reach-back cases
        s1 = "".join(rng.choice("abc") for _ in range(n1))
        s2 = "".join(rng.choice("abc") for _ in range(n2))
        pairs.append((s1, s2))
    exprs = [
        f"damerauLevenshteinDistance({_sql_str(a)}, {_sql_str(b)})"
        for a, b in pairs
    ]
    got = _batch(spark, exprs)
    for (a, b), g in zip(pairs, got):
        assert g == _ref_damerau(a, b), (a, b, g, _ref_damerau(a, b))


def test_fuzz_base58_and_hashes(spark):
    rng = random.Random(44)
    strs = []
    for _ in range(40):
        n = rng.randint(0, 20)
        strs.append(
            "".join(rng.choice("aZ09 _.!?") for _ in range(n))
        )
    keys = [rng.randint(0, 2**63 - 1) for _ in range(30)]
    buckets = [rng.randint(1, 500) for _ in range(30)]
    exprs = [f"base58Encode({_sql_str(s)})" for s in strs]
    exprs += [
        f"base58Decode(base58Encode({_sql_str(s)}))"
        for s in strs if s
    ]
    exprs += [f"javaHash({_sql_str(s)})" for s in strs]
    exprs += [
        f"jumpConsistentHash({k}, {n})" for k, n in zip(keys, buckets)
    ]
    exprs += [
        f"byteHammingDistance({_sql_str(a)}, {_sql_str(b)})"
        for a, b in zip(strs, strs[1:] + strs[:1])
    ]
    got = _batch(spark, exprs)
    i = 0
    for s in strs:
        assert got[i] == _ref_base58(s.encode()), (s, got[i])
        i += 1
    for s in strs:
        if s:
            assert got[i] == s, (s, got[i])  # roundtrip law
            i += 1
    for s in strs:
        assert got[i] == _ref_javahash(s), (s, got[i])
        i += 1
    for k, n in zip(keys, buckets):
        assert got[i] == _ref_jumphash(k, n), (k, n, got[i])
        assert 0 <= got[i] < n
        i += 1
    for a, b in zip(strs, strs[1:] + strs[:1]):
        assert got[i] == _ref_byte_hamming(a, b), (a, b, got[i])
        i += 1
