"""Eventual-drain helper for the query-tracking registry.

After a KILL or a max_execution_time timeout, the watchdog cancels the
Spark job group and the SERVING thread unwinds (task-kill storms of a
cancelled 30-billion-row scan take visible wall time under load) before
reaping its processlist entry.  The engine's contract is that the
registry DRAINS — no ghost entries — not that it is empty on the very
next statement.  Asserting instantaneous emptiness manufactured the
r14/r15 flake class (test_max_execution_time_over_{native,http}: green
in isolation, red under co-tenant CPU waves); polling asserts the actual
contract.
"""

from __future__ import annotations

import time


def wait_processlist_drained(engine, timeout_s: float = 20.0) -> int:
    """Poll `show processlist` until empty or timeout; returns the final
    count (callers assert == 0)."""
    deadline = time.time() + timeout_s
    n = engine.sql("show processlist").count()
    while n and time.time() < deadline:
        time.sleep(0.25)
        n = engine.sql("show processlist").count()
    return n
