-- Port of the reference's select-all + partition-prune integration
-- sequences (crates/tests_integ/tests/sanity_checks.rs:1264 and :1292):
-- SELECT * returns every declared column; a non-partition-column
-- predicate on a partitioned table still sees all rows (pruning must
-- never DROP rows it cannot prove absent).

DROP TABLE IF EXISTS sel_tab

CREATE TABLE sel_tab(a UInt64, b UInt64)

INSERT INTO sel_tab VALUES (1, 1), (2, 2)

:1,1
select * from sel_tab where b = 1

:2
select count(*) as n from sel_tab

DROP TABLE IF EXISTS sel_part_tab

CREATE TABLE sel_part_tab(a UInt64, b UInt64) PARTITION BY a

INSERT INTO sel_part_tab VALUES (1, 1), (2, 2)

:1
select a from sel_part_tab where b = 1

:2
select a from sel_part_tab where a = 2

-- pruning on the partition column itself: predicate + aggregate agree
:1,2
select count(*) as n, sum(b) as s from sel_part_tab where a = 2

DROP TABLE sel_tab

DROP TABLE sel_part_tab
