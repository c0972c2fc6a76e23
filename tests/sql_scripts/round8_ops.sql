-- Round-8 operational surface composed in ONE session: the
-- distribution-aggregate HAVING / ORDER BY lowering (count(*) counts RAW
-- rows, not distinct pairs — ADVICE r7 #1 / VERDICT r7 #5), the
-- empty-source count(*) coalesce, and UInt64 reinterpret stamping scoped
-- to top-level columns (composites keep the lossless Decimal default —
-- ADVICE r7 #2).

DROP TABLE IF EXISTS r8_t

CREATE TABLE r8_t(k String, v String)

INSERT INTO r8_t VALUES ('a','x'),('a','x'),('a','y'),('b','z'),('b','z'),('b','z'),('b','z')

-- HAVING count(*) filters raw rows (group b: 4 rows over 1 distinct value)
:b,4
select k, count(*) as n from r8_t group by k having count(*) > 3

-- ORDER BY count(*) with a dist-agg in the select list: raw-row ordering
-- must put b (4 rows, 1 pair) ahead of a (3 rows, 2 pairs)
:b,z
select k, arrayStringConcat(topK(1)(v), '|') as t from r8_t group by k order by count(*) desc limit 1

-- topK + HAVING count(*) lowers (previously kept the buffered form)
:b,z
select k, arrayStringConcat(topK(1)(v), '|') as t from r8_t group by k having count(*) > 3

-- the lowering itself: distribution values over the lowered rows
:a,x|y
select k, arrayStringConcat(topK(2)(v), '|') as t from r8_t group by k having count(*) = 3

DROP TABLE IF EXISTS r8_e

CREATE TABLE r8_e(v String)

-- EMPTY ungrouped source: count(*) stays 0 after lowering, never NULL
:0,0
select count(*) as n, entropy(v) as e from r8_e

SET uint64_storage = 'reinterpret'

DROP TABLE IF EXISTS r8_u

CREATE TABLE r8_u(k UInt64, n Nullable(UInt64), a Array(UInt64))

SET uint64_storage = 'decimal'

INSERT INTO r8_u VALUES (18446744073709551615, 18446744073709551615, array(18446744073709551615, 5))

-- top-level UInt64 / Nullable(UInt64) reinterpret (2^64-1 -> -1) ...
:-1,-1
select k, n from r8_u

-- ... while the Array(UInt64) element keeps the LOSSLESS decimal value
-- (1.84467e+19 is the runner's 6-sig-digit float rendering of 2^64-1)
:1.84467e+19,5
select a[1] as e1, a[2] as e2 from r8_u
