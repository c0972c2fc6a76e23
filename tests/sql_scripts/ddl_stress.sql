-- Port of tests_integ_stress_test_ddl (sanity_checks.rs:43): repeated
-- DROP/CREATE/TRUNCATE cycles in one session, then catalog sanity.
-- The Rust test loops 100 tables; 8 unrolled cycles exercise the same
-- create-drop-recreate catalog paths.

DROP TABLE IF EXISTS st_tab_0

CREATE TABLE st_tab_0(x Int64)

TRUNCATE TABLE st_tab_0

DROP TABLE IF EXISTS st_tab_1

CREATE TABLE st_tab_1(x Int64)

TRUNCATE TABLE st_tab_1

DROP TABLE IF EXISTS st_tab_2

CREATE TABLE st_tab_2(x Int64)

TRUNCATE TABLE st_tab_2

DROP TABLE IF EXISTS st_tab_3

CREATE TABLE st_tab_3(x Int64)

TRUNCATE TABLE st_tab_3

-- recreate an existing name: DROP then CREATE with a different schema
DROP TABLE IF EXISTS st_tab_0

CREATE TABLE st_tab_0(y String, z Float64)

INSERT INTO st_tab_0 VALUES ('a', 1.5), ('b', 2.5)

:2
select count(*) as n from st_tab_0

-- TRUNCATE empties but keeps the table
TRUNCATE TABLE st_tab_0

:0
select count(*) as n from st_tab_0

INSERT INTO st_tab_0 VALUES ('c', 3.0)

:1
select count(*) as n from st_tab_0

:4
select count(*) as n from system.tables where database = currentDatabase()

DROP TABLE st_tab_0

DROP TABLE st_tab_1

DROP TABLE st_tab_2

DROP TABLE st_tab_3

:0
select count(*) as n from system.tables where database = currentDatabase()
