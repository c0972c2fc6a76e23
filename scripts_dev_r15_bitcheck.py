#!/usr/bin/env python
"""r15 bit-identity sweep: collect the result sets of the touched
approximate/ANN queries at the given SF dirs and write them (sorted
stringified tuples) to a file — run under two checkouts (old/new code) and
diff the outputs to prove result identity.

Usage: python scripts_dev_r15_bitcheck.py <out_file> <query> [query...]
SF dirs via SPARK_GRAFT_BITCHECK_SFS (comma-sep, default sf0.01,sf0.1).
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    out_file = sys.argv[1]
    names = sys.argv[2:]
    sfs = os.environ.get(
        "SPARK_GRAFT_BITCHECK_SFS", "/root/testdata/sf0.01,/root/testdata/sf0.1"
    ).split(",")
    from tensorbase_spark.queries import registry
    from tensorbase_spark.session import get_spark

    spark = get_spark("r15_bitcheck")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    with open(out_file, "w") as f:
        for sf_dir in sfs:
            for name in names:
                rows = sorted(str(tuple(r)) for r in reg[name].fn(spark, sf_dir).collect())
                f.write(f"== {name} @ {sf_dir}: {len(rows)} rows\n")
                for r in rows:
                    f.write(r + "\n")
                print(f"{name} @ {sf_dir}: {len(rows)} rows", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
