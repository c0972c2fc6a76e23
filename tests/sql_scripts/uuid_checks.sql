-- Port of the reference's UUID integration sequence
-- (crates/tests_integ/tests/sanity_checks.rs:1204: generateUUIDv4 twice
-- differ, toUUID canonicalizes, UUIDStringToNum/UUIDNumToString
-- round-trip).  UUIDs map to canonical lowercase strings (SURVEY §1.2);
-- the 16-byte num form is a real binary, asserted via length and
-- round-trip equality exactly as the reference does.

DROP TABLE IF EXISTS uuid_tab

CREATE TABLE uuid_tab(b String)

INSERT INTO uuid_tab VALUES ('612F3C40-5D3B-217E-707B-6A546A3D7B29')

:true,true
select generateUUIDv4() != generateUUIDv4() as distinct_v4,
       length(generateUUIDv4()) = 36 as v4_len
from uuid_tab

:612f3c40-5d3b-217e-707b-6a546a3d7b29,16,true
select toUUID(b) as u,
       length(UUIDStringToNum(b)) as num_len,
       UUIDNumToString(UUIDStringToNum(b)) = lower(b) as roundtrip
from uuid_tab

:NULL,00000000-0000-0000-0000-000000000000
select toUUIDOrNull('not-a-uuid') as u_null,
       toUUIDOrZero('not-a-uuid') as u_zero
from uuid_tab

DROP TABLE uuid_tab
