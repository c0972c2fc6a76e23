-- Port of tests_integ_partition_prune (sanity_checks.rs:1294): identity
-- partition key, predicates on key and non-key columns, plus the
-- partition-management verbs composed in one session.

DROP TABLE IF EXISTS pp1_tab

CREATE TABLE pp1_tab(a UInt64, b UInt64) partition by a

INSERT INTO pp1_tab VALUES (1,1), (2,2)

-- non-key predicate still answers correctly (scan, no prune)
:1
select a from pp1_tab where b = 1

DROP TABLE IF EXISTS pp2_tab

CREATE TABLE pp2_tab(a UInt32, b UInt32) partition by a

INSERT INTO pp2_tab VALUES (1,1), (2,2)

-- key <> predicate: reference asserts 1 row back
:1
select count(*) as n from pp2_tab where a <> 1

-- key equality: pruned single-partition read
:2
select b from pp2_tab where a = 2

-- composed partition management in the same session
DROP TABLE IF EXISTS pp3_tab

CREATE TABLE pp3_tab(d Date, x Int64) partition by toYYYYMM(d)

INSERT INTO pp3_tab VALUES (date'2020-01-05', 1), (date'2020-02-10', 2), (date'2020-03-15', 4)

ALTER TABLE pp3_tab DETACH PARTITION '202001'

:6,2
select sum(x) as s, count(*) as n from pp3_tab

ALTER TABLE pp3_tab ATTACH PARTITION '202001'

:7,3
select sum(x) as s, count(*) as n from pp3_tab

ALTER TABLE pp3_tab DROP PARTITION '202002'

:5,2
select sum(x) as s, count(*) as n from pp3_tab

DROP TABLE pp1_tab

DROP TABLE pp2_tab

DROP TABLE pp3_tab
