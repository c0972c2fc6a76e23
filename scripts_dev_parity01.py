"""Dev-only: rehearse the driver's CORRECTNESS gate at sf0.01 for the
registry head (the ~50 entries the driver will actually check this round)."""

import sys
import time

import duckdb

from tensorbase_spark.oracle import compare_query
from tensorbase_spark.queries import registry
from tensorbase_spark.session import get_spark

SF = "/root/testdata/sf0.01"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 55
OFFSET = int(sys.argv[2]) if len(sys.argv) > 2 else 0

spark = get_spark("parity01")
duck = duckdb.connect()
for t in (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
):
    duck.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

reg = registry()
names = list(reg)[OFFSET : OFFSET + N]
bad = []
for name in names:
    q = reg[name]
    t0 = time.time()
    if q.oracle is None:
        try:
            n_rows = q.fn(spark, SF).count()
            status = f"rows-only {n_rows}"
        except Exception as e:  # noqa: BLE001
            status = f"ERROR {e}"
            bad.append(name)
    else:
        try:
            r = compare_query(spark, duck, name, q.fn, q.oracle, SF)
            ok = (
                r.spark_rows == r.oracle_rows and r.cols_match and r.hash_match
            )
            status = (
                f"{'OK' if ok else 'FAIL'} rows={r.spark_rows}/{r.oracle_rows} "
                f"cols={r.cols_match} hash={r.hash_match}"
            )
            if not ok:
                bad.append(name)
        except Exception as e:  # noqa: BLE001
            status = f"ERROR {type(e).__name__}: {e}"
            bad.append(name)
    print(f"{name:40s} {status}  ({time.time() - t0:.1f}s)", flush=True)

print("\nFAILURES:", bad if bad else "none")
