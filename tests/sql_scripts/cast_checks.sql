-- Port of the reference's cast integration sequences
-- (crates/tests_integ/tests/sanity_checks.rs:623-800):
-- LargeUtf8/String storage + equality filter, scalar casts across the
-- integer/float boundary, Int32 sum widened through cast, Date casts
-- from strings with a range predicate.

DROP TABLE IF EXISTS cast_tab_s

CREATE TABLE cast_tab_s(s String)

INSERT INTO cast_tab_s VALUES ('a'), ('ab'), ('abc')

:3
select count(s) as n from cast_tab_s

:1
select count(*) as n from cast_tab_s where s = 'ab'

:2147483647
select cast(2147483647 as Int64) as v

:-2147483648
select cast(-2147483648 as Int64) as v

:1e-06
select cast(0.000001 as Float64) as v

DROP TABLE IF EXISTS cast_tab_i

CREATE TABLE cast_tab_i(a Int32)

-- the reference inserts 1..99999 over the wire; same rows via INSERT SELECT
INSERT INTO cast_tab_i select cast(id + 1 as int) from range(99999)

:4999950000
select sum(cast(a as Int64)) as s from cast_tab_i

DROP TABLE IF EXISTS cast_tab_d

CREATE TABLE cast_tab_d(a Date)

INSERT INTO cast_tab_d VALUES ('2010-10-20'), ('2020-01-07')

:2010-10-20
:2020-01-07
select cast(a as string) as d from cast_tab_d

:1
select count(1) as n from cast_tab_d where a < '2011-11-11'

DROP TABLE cast_tab_s

DROP TABLE cast_tab_i

DROP TABLE cast_tab_d
