-- Round-7 operational surface composed in ONE session: UInt64 reinterpret
-- storage, Buffer-engine park/flush visibility, distribution-aggregate
-- lowering results, CAST-target type names, tier-7/8 functions.

SET uint64_storage = 'reinterpret'

DROP TABLE IF EXISTS r7_u

CREATE TABLE r7_u(k UInt64, v Int64)

SET uint64_storage = 'decimal'

INSERT INTO r7_u VALUES (18446744073709551615, 1), (7, 2)

-- 2^64-1 reinterprets as -1 (two's complement); equality stays exact
:-1,1
select k, v from r7_u where k = -1

:2
select count(*) as n from r7_u

DROP TABLE IF EXISTS r7_tgt

CREATE TABLE r7_tgt(a Int64, s String)

DROP TABLE IF EXISTS r7_buf

CREATE TABLE r7_buf(a Int64, s String) ENGINE = Buffer(currentDatabase(), r7_tgt, 64, 10, 100, 10000, 1000000, 10000000, 100000000)

INSERT INTO r7_buf VALUES (1, 'p'), (2, 'q')

-- pending rows: alias sees them, target does not
:0
select count(*) as n from r7_tgt

:2
select count(*) as n from r7_buf

OPTIMIZE TABLE r7_buf

:2,2
select (select count(*) from r7_tgt) as t, count(*) as b from r7_buf

-- distribution aggregates (two-level lowering) + cast-target type names
DROP TABLE IF EXISTS r7_d

CREATE TABLE r7_d(g String, x Int64)

INSERT INTO r7_d VALUES ('a', 1), ('a', 1), ('a', 2), ('b', 5)

:a,1|2,3,0.918296
:b,5,1,0
select g, arrayStringConcat(topK(2)(x), '|') as tk,
       cast(count(*) as Int64) as n,
       round(entropy(x), 6) as e
from r7_d group by g order by g

:3,6,2,x-1
select cast(gcd(12, 9) as Int32) as g, cast(lcm(2, 3) as Int64) as l,
       editDistance('abc', 'axd') as ed, format('{}-{}', 'x', 1) as f

DROP TABLE r7_u

DROP TABLE r7_buf

DROP TABLE r7_tgt

DROP TABLE r7_d
