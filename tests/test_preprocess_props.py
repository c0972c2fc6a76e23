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


# --- round-5 rewrites: scalar WITH, LIMIT WITH TIES, balanced parens ------

def test_scalar_with_leaves_ctes_untouched():
    from tensorbase_spark.engine import _rewrite_scalar_with

    ctes = [
        "with c as (select a from t) select * from c",
        "with c as (select a from t), d as (select b from u) "
        "select * from c join d on c.a = d.b",
        "with recursive s(n) as (select 1 union all select n+1 from s "
        "where n < 5) select * from s",
        # mixed CH + CTE: conservative bail, untouched
        "with 5 as n, c as (select a from t) select * from c",
        "select a from t",  # no WITH at all
    ]
    for q in ctes:
        assert _rewrite_scalar_with(q) == q, q


def test_scalar_with_inlines_and_respects_strings():
    from tensorbase_spark.engine import _rewrite_scalar_with

    out = _rewrite_scalar_with("with 5 as n select n, 'n' as lit from t")
    assert "(5)" in out and "'n'" in out and "with" not in out.lower()
    # chained aliases expand through each other
    out2 = _rewrite_scalar_with("with 2 as a, a + 1 as b select b from t")
    assert "((2) + 1)" in out2


def test_with_ties_only_rewrites_the_clause():
    from tensorbase_spark.engine import _rewrite_limit_with_ties

    plain = [
        "select a from t order by a limit 5",
        "select a from t limit 5",
        "select 'limit 5 with ties' as s from t",
    ]
    for q in plain:
        assert _rewrite_limit_with_ties(q) == q, q
    out = _rewrite_limit_with_ties("select a from t order by a limit 5 with ties")
    assert "rank() over" in out and "__rk <= 5" in out


def test_strip_outer_parens_balanced_only():
    from tensorbase_spark.engine import _strip_outer_parens

    assert _strip_outer_parens("(a, b)") == "a, b"
    assert _strip_outer_parens("cityHash64(id)") == "cityHash64(id)"
    assert _strip_outer_parens("(a, f(b))") == "a, f(b)"
    assert _strip_outer_parens("((x))") == "x"
    assert _strip_outer_parens("(a) + (b)") == "(a) + (b)"


def test_param_binder_skips_literals_and_plain_text():
    from tensorbase_spark.engine import TensorBaseEngine

    class _Stub(TensorBaseEngine):
        def __init__(self):  # no SparkSession needed for the binder
            self._params = {"x": "7"}

    e = _Stub()
    assert e._bind_query_params("select 1") == "select 1"
    out = e._bind_query_params("select {x:Int64} as v, '{x:Int64}' as lit")
    assert "CAST('7' AS bigint)" in out and "'{x:Int64}'" in out
    import pytest as _p

    with _p.raises(ValueError, match="param_y"):
        e._bind_query_params("select {y:Int64}")
