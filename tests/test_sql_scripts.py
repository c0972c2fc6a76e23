"""E2E SQL-script runner — the reference's integration-test shape.

Mirrors ``crates/tests_integ/src/sql_test_runner.rs:51-87``: a ``.sql``
script is a sequence of BLANK-LINE-separated statements run in order
against ONE engine session (``crates/tests_integ/sql_test_scripts/
basic_checks.sql`` is the reference's example, including its ``:expected``
assertion directive).  This exercises cross-statement session state —
USE / SET / query-cache epochs / projections / detached partitions — in
the composed form the per-query registry cannot.

Script grammar (superset of the reference's):
- statements separated by one or more blank lines;
- ``--`` lines are comments (dropped anywhere in a block);
- a block may start with ``:``-prefixed EXPECTED-ROW lines — each
  ``:a,b,c`` is one expected row of comma-separated cells; the remaining
  lines form the SELECT whose result must equal that multiset of rows
  (order-insensitive, floats to 6 significant digits — the reference
  asserts scalar equality the same way, sanity_checks.rs:228-241);
- a block of only ``:error`` + a statement asserts the statement RAISES.
"""

from __future__ import annotations

import math
import os
from pathlib import Path

import pytest

SCRIPT_DIR = Path(__file__).parent / "sql_scripts"
SCRIPTS = sorted(p.name for p in SCRIPT_DIR.glob("*.sql"))


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6g}"
    except Exception:
        pass
    return str(v)


def parse_script(text: str) -> list[tuple[list[str] | None, bool, str]]:
    """-> [(expected_rows | None, expect_error, statement_sql), ...]"""
    blocks: list[tuple[list[str] | None, bool, str]] = []
    for raw in text.split("\n\n"):
        lines = [
            ln for ln in raw.strip().splitlines()
            if ln.strip() and not ln.lstrip().startswith("--")
        ]
        if not lines:
            continue
        expected: list[str] | None = None
        expect_error = False
        while lines and lines[0].lstrip().startswith(":"):
            directive = lines.pop(0).lstrip()[1:].strip()
            if directive.lower() == "error":
                expect_error = True
            else:
                expected = (expected or []) + [directive]
        if not lines:
            raise ValueError(f"assertion directive without a statement: {raw!r}")
        blocks.append((expected, expect_error, "\n".join(lines)))
    return blocks


def run_script(engine, path: Path) -> int:
    """Run every statement of one script against one engine session,
    checking ``:expected`` blocks; returns the statement count."""
    blocks = parse_script(path.read_text())
    for i, (expected, expect_error, stmt) in enumerate(blocks):
        if expect_error:
            with pytest.raises(Exception):
                engine.sql(stmt).collect()
            continue
        try:
            out = engine.sql(stmt)
        except Exception as e:  # pragma: no cover - debugging aid
            raise AssertionError(
                f"{path.name} statement#{i} raised {type(e).__name__}: "
                f"{e}\n{stmt}"
            ) from e
        if expected is not None:
            got = sorted(
                ",".join(_norm(c) for c in row) for row in out.collect()
            )
            want = sorted(e.replace(", ", ",") for e in expected)
            assert got == want, (
                f"{path.name} statement#{i}:\n{stmt}\n"
                f"expected {want}\n     got {got}"
            )
    return len(blocks)


@pytest.fixture()
def engine(spark):
    import uuid

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    db = f"sqs_{uuid.uuid4().hex[:8]}"
    eng.sql(f"create database {db}")
    eng.sql(f"use {db}")
    yield eng
    spark.catalog.setCurrentDatabase("default")
    eng.sql(f"drop database if exists {db}")


@pytest.mark.parametrize("script", SCRIPTS)
def test_sql_script(engine, script):
    # scripts may export/backup under /tmp/tb_sqs_*; BACKUP refuses to
    # overwrite (CH contract), so a prior run's leftovers must go first
    import glob as _glob
    import shutil as _shutil

    for p in _glob.glob("/tmp/tb_sqs_*"):
        _shutil.rmtree(p, ignore_errors=True)
    n = run_script(engine, SCRIPT_DIR / script)
    assert n > 0


def test_scripts_exist():
    """The suite must carry the reference's script set (basic_checks.sql
    analogue plus the sanity_checks.rs sequence ports)."""
    assert len(SCRIPTS) >= 4, SCRIPTS
