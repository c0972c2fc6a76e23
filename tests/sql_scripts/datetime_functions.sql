-- Port of the reference's datetime-function integration sequence
-- (crates/tests_integ/tests/sanity_checks.rs:981-1190): one table holding
-- the same instants as Date, DateTime, date-string, datetime-string,
-- epoch-days and epoch-seconds; every extractor (toYear..toSecond,
-- toDayOfWeek Monday=1) and both directions of toDate/toDateTime must
-- agree across representations.  Rows include the 2012-02-29 leap day
-- (day-of-year 60) exactly as the reference's fixture does.

DROP TABLE IF EXISTS dt_tab

CREATE TABLE dt_tab(a Date, b DateTime, c String, ct String, d Int64, dt Int64)

INSERT INTO dt_tab VALUES
  ('2010-01-01', '2010-01-01 01:01:01', '2010-1-1', '2010-01-01 01:01:01', 14610, 1262307661),
  ('2011-02-28', '2011-02-28 02:05:06', '2011-2-28', '2011-02-28 02:05:06', 15033, 1298858706),
  ('2012-02-29', '2012-02-29 23:59:59', '2012-02-29', '2012-02-29 23:59:59', 15399, 1330559999),
  ('2012-03-04', '2012-03-04 05:06:07', '2012-03-4', '2012-03-04 05:06:07', 15403, 1330837567),
  ('2021-08-31', '2021-08-31 14:32:03', '2021-8-31', '2021-08-31 14:32:03', 18870, 1630420323),
  ('2021-06-27', '2021-06-27 17:44:32', '2021-6-27', '2021-06-27 17:44:32', 18805, 1624815872)

:2010,1,1,1,5,1
:2011,2,59,28,1,1
:2012,2,60,29,3,1
:2012,3,64,4,7,1
:2021,8,243,31,2,3
:2021,6,178,27,7,2
select toYear(a) as y, toMonth(a) as m, toDayOfYear(a) as doy,
       toDayOfMonth(a) as dom, toDayOfWeek(a) as dow, toQuarter(a) as q
from dt_tab

:2010,1,1,5,1
:2011,2,28,1,1
:2012,2,29,3,1
:2012,3,4,7,1
:2021,8,31,2,3
:2021,6,27,7,2
select toYear(b) as y, toMonth(b) as m, toDayOfMonth(b) as dom,
       toDayOfWeek(b) as dow, toQuarter(b) as q
from dt_tab

:1,1,1
:2,5,6
:23,59,59
:5,6,7
:14,32,3
:17,44,32
select toHour(b) as h, toMinute(b) as mi, toSecond(b) as s from dt_tab

-- toDate across representations: Date col, DateTime col, relaxed string
:6
select count(*) as n from dt_tab
where toDate(b) = a and cast(c as date) = a

-- toDateTime across representations: datetime-string and epoch seconds
:6
select count(*) as n from dt_tab
where toDateTime(ct) = b and toDateTime(dt) = b

-- epoch-day column agrees with the Date column
:6
select count(*) as n from dt_tab
where datediff(a, '1970-01-01') = d

DROP TABLE dt_tab
