-- Round-6 operational surface in ONE composed session: lightweight DELETE,
-- SYSTEM merges gate + query-cache drop, Null-engine MV fan-out, merge()/
-- view()/file() table functions, BACKUP/RESTORE, EXISTS/CHECK, Nested.

DROP TABLE IF EXISTS r6_a

DROP TABLE IF EXISTS r6_b

CREATE TABLE r6_a(k Int64, v Int64)

CREATE TABLE r6_b(k Int64, v Int64)

INSERT INTO r6_a VALUES (1, 10), (2, 20), (3, 30)

INSERT INTO r6_b VALUES (4, 40)

-- lightweight DELETE routes through the mutation rewrite
DELETE FROM r6_a WHERE k = 2

:2,40
select count(*) as n, sum(v) as s from r6_a

-- merge() unions both tables by regex; _table only when referenced
:3,80
select count(*) as n, sum(v) as s from merge('^r6_')

:r6_a,2
select _table, count(*) as n from merge('^r6_') group by _table order by _table limit 1

-- view() is an inline derived table
:40
select max(s.v) as mv from view(select v from merge('^r6_')) as s

-- SYSTEM STOP MERGES gates OPTIMIZE; START re-enables
SYSTEM STOP MERGES r6_a

:error
OPTIMIZE TABLE r6_a

SYSTEM START MERGES r6_a

OPTIMIZE TABLE r6_a

-- Null engine: reads empty, MV trigger fires into a real target
CREATE TABLE r6_agg(k Int64, s Int64)

CREATE TABLE r6_null(k Int64, v Int64) ENGINE = Null

CREATE MATERIALIZED VIEW r6_mv TO r6_agg AS select k, sum(v) as s from r6_null group by k

INSERT INTO r6_null VALUES (7, 1), (7, 2), (8, 5)

:0
select count(*) as n from r6_null

:7,3
select k, s from r6_agg where k = 7

-- EXISTS / CHECK
:1
exists table r6_a

:0
exists table r6_zzz

-- file() round trip through INSERT INTO FUNCTION
INSERT INTO FUNCTION file('/tmp/tb_sqs_r6_export', 'Parquet') select k, v from r6_a

:2,40
select count(*) as n, sum(v) as s from file('/tmp/tb_sqs_r6_export', 'Parquet')

-- BACKUP -> DROP -> RESTORE preserves rows (path cleaned by the runner env)
BACKUP TABLE r6_a TO '/tmp/tb_sqs_r6_backup'

DROP TABLE r6_a

RESTORE TABLE r6_a FROM '/tmp/tb_sqs_r6_backup'

:2,40
select count(*) as n, sum(v) as s from r6_a

-- Nested column: flattened insert, ARRAY JOIN lockstep scalars
CREATE TABLE r6_n(uid Int64, g Nested(tag String, w Int64))

INSERT INTO r6_n VALUES (1, array('x','y'), array(3, 4))

:1,x,3
select uid, g.tag as t, g.w as w from r6_n array join g order by w limit 1

:error
INSERT INTO r6_n VALUES (2, array('z'), array(1, 2))

DROP TABLE r6_n
