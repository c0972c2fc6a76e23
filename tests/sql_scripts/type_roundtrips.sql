-- Port of the per-type insert round-trips (sanity_checks.rs:196-493:
-- tests_integ_basic_insert_{float,decimal32,string,date,datetime,...}):
-- one table per declared BQL type, insert literals, read back count/sum/
-- values through the engine's type mapping (types.py).

DROP TABLE IF EXISTS rt_i64

CREATE TABLE rt_i64(a Int64)

INSERT INTO rt_i64 VALUES (1), (3), (5), (7), (9), (11)

:6,36
select count(a) as n, sum(a) as s from rt_i64

DROP TABLE IF EXISTS rt_f64

CREATE TABLE rt_f64(a Float64)

INSERT INTO rt_f64 VALUES (1.1), (1.2), (1.3)

:3,3.6
select count(a) as n, round(sum(a), 6) as s from rt_f64

DROP TABLE IF EXISTS rt_dec

CREATE TABLE rt_dec(a Decimal(9,2))

INSERT INTO rt_dec VALUES (123.00), (10.02)

:123
:10.02
select a from rt_dec

DROP TABLE IF EXISTS rt_str

CREATE TABLE rt_str(a String)

INSERT INTO rt_str VALUES ('ab'), ('cd'), ('ef')

:ab,1
:cd,1
:ef,1
select a, count(*) as n from rt_str group by a

DROP TABLE IF EXISTS rt_date

CREATE TABLE rt_date(a Date)

INSERT INTO rt_date VALUES (date'2021-06-01'), (date'2021-06-15')

:2021,6
select toYear(max(a)) as y, toMonth(min(a)) as m from rt_date

DROP TABLE IF EXISTS rt_dt

CREATE TABLE rt_dt(a DateTime)

INSERT INTO rt_dt VALUES (timestamp'2021-06-01 10:30:00')

:10,30
select toHour(a) as h, toMinute(a) as m from rt_dt

DROP TABLE IF EXISTS rt_u8

CREATE TABLE rt_u8(a UInt8, b Int32)

INSERT INTO rt_u8 VALUES (250, -5), (5, 5)

:255,0
select sum(a) as sa, sum(b) as sb from rt_u8

-- cleanup
DROP TABLE rt_i64

DROP TABLE rt_f64

DROP TABLE rt_dec

DROP TABLE rt_str

DROP TABLE rt_date

DROP TABLE rt_dt

DROP TABLE rt_u8
