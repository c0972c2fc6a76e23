-- Port of crates/tests_integ/sql_test_scripts/basic_checks.sql — the
-- reference's own e2e script, verbatim sequence (runner splits on blank
-- lines exactly like sql_test_runner.rs:74-87).

DROP TABLE IF EXISTS test_tab

CREATE TABLE test_tab(a UInt64)

INSERT INTO test_tab VALUES (1), (2), (3)

:6
select sum(a) as s from test_tab

DROP TABLE test_tab
