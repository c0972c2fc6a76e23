"""Property tests for the dialect clause preprocessor and translator.

The two round-3 advisor findings (WITH TOTALS swallowing a nested GROUP BY,
multi-assignment SET corruption) were both regex-rewrite bugs.  These tests
pin the invariants that class of bug violates:

- plain ANSI SQL with none of the CH trigger keywords passes through
  _preprocess_ch_clauses byte-identical;
- the preprocessor is idempotent on a corpus of representative CH
  statements (a second pass must not rewrite its own output);
- string literals are opaque to both the preprocessor and translate_sql,
  even when they contain trigger keywords or function-call spellings.
"""

from __future__ import annotations

import pytest

from tensorbase_spark.engine import _preprocess_ch_clauses, translate_sql

PLAIN = [
    "select a, b from t where a > 1 group by a, b having count(*) > 2",
    "select * from t order by a desc limit 10",
    "with c as (select a from t) select * from c join u on c.a = u.a",
    "select count(*) from t where x between 1 and 2 and y in (1, 2, 3)",
    "select a from t union all select b from u",
    "insert into t select * from u where k % 2 = 0",
    "select case when a > 0 then 'p' else 'n' end from t",
]


@pytest.mark.parametrize("q", PLAIN)
def test_preprocess_identity_on_plain_sql(q):
    assert _preprocess_ch_clauses(q) == q


CH_CORPUS = [
    "select a, sum(v) from t group by a with totals",
    "select t, sum(n) from (select a as t, count(*) as n from x group by a) z "
    "group by t with totals",
    "select * from t final where a = 1",
    "select * from t as f final",
    "select a from t global join u on t.k = u.k",
    "select a from t all inner join u on t.k = u.k",
    "select a from t semi left join u on t.k = u.k",
    "select a from t prewhere a > 1 where b < 2 group by a",
    "select * except b from t",
    "select * except (b, c) from t",
    "select * replace(a * 2 as a) from t",
    "select * except (c) replace(b + 1 as b) from t",
    "select k from t order by k limit 5, 10",
    "select k, v from t order by v limit 2 by k",
    "select a from t settings max_threads = 4 format JSONEachRow",
    "select a from t settings max_threads = 4",
]


@pytest.mark.parametrize("q", CH_CORPUS)
def test_preprocess_idempotent(q):
    once = _preprocess_ch_clauses(q)
    assert _preprocess_ch_clauses(once) == once


LITERAL_QUERIES = [
    "select 'group by x with totals' as s from t",
    "select 'from t final' as s",
    "select '* except b' as s",
    "select 'limit 1, 2' as s",
    "select 'toYear(d)' as s",
    'select "a FINAL" from t',
]


@pytest.mark.parametrize("q", LITERAL_QUERIES)
def test_string_literals_are_opaque(q):
    # the literal text must survive both layers verbatim
    lit = q.split("'")[1] if "'" in q else q.split('"')[1]
    assert lit in _preprocess_ch_clauses(q)
    assert lit in translate_sql(_preprocess_ch_clauses(q))


def test_translate_leaves_unknown_functions_untouched():
    q = "select my_udf(a, 1) from t"
    assert translate_sql(q) == q


def test_set_multi_assignment_split_depth0():
    """Depth-0 comma split: a comma inside a quoted value must not split
    the assignment."""
    from tensorbase_spark.engine import _split_depth0

    parts = _split_depth0("a = 1, b = 'x,y', c = f(1, 2)")
    assert parts == ["a = 1", "b = 'x,y'", "c = f(1, 2)"]
