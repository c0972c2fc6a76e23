-- Merge-semantics engines composed in one session: ReplacingMergeTree
-- upserts served through FINAL, materialized by OPTIMIZE FINAL;
-- SummingMergeTree continuous pre-aggregation.  (engine.py
-- _rewrite_final / _merged_result_df; round-6 surface.)

DROP TABLE IF EXISTS me_profile

CREATE TABLE me_profile (uid Int64, city String, ver Int64) ENGINE = ReplacingMergeTree(ver) ORDER BY uid

INSERT INTO me_profile VALUES (1, 'rome', 1), (2, 'oslo', 1)

-- upsert: user 1 moves
INSERT INTO me_profile VALUES (1, 'kyiv', 2)

:2,kyiv
select count(*) as n, argMax(city, ver) as c from me_profile final where uid = 1 or uid = 2

-- both versions still physically present pre-merge
:3
select count(*) as n from me_profile

OPTIMIZE TABLE me_profile FINAL

:2
select count(*) as n from me_profile

:kyiv
select city from me_profile where uid = 1

DROP TABLE IF EXISTS me_counters

CREATE TABLE me_counters (k String, hits Int64) ENGINE = SummingMergeTree ORDER BY k

INSERT INTO me_counters VALUES ('home', 1), ('home', 4), ('about', 2)

:about,2
:home,5
select k, hits from me_counters final

OPTIMIZE TABLE me_counters FINAL

:2
select count(*) as n from me_counters

DROP TABLE me_profile

DROP TABLE me_counters
