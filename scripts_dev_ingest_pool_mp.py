"""Dev: OUT-OF-PROCESS pooled native-wire ingest slope (PLANS §24/§27).

The in-process harness (scripts_dev_ingest_pool.py) measures an honest
~1.3x for 12 connections because client-side encode (varint packing +
LZ4) and the server share ONE Python GIL.  The reference's
bench_ingestion.rs clients are real OS threads in a separate process
from the server.  This variant moves the client pool into separate OS
PROCESSES (multiprocessing 'spawn' — no JVM fork), so the protocol's
true concurrency headroom is measured: N encoders in parallel against
the threaded server, like N real clients would.

Run: python scripts_dev_ingest_pool_mp.py [rows_per_block [n_blocks]]
"""
import sys
import time


def _worker(port: int, compression: bool, rows_per: int,
            block_ids: list[int]) -> int:
    """One client process: encode + send its share of blocks."""
    from tensorbase_spark.sources.chnative import NativeClient

    with NativeClient(port=port, compression=compression) as c:
        for b in block_ids:
            base = b * rows_per
            c.insert("pbuf", [
                ("a", "Int64", list(range(base, base + rows_per))),
                ("b", "Int64", [(base + i) % 100
                                for i in range(rows_per)]),
            ])
    return len(block_ids)


def main() -> int:
    rows_per = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    import multiprocessing as mp

    ctx = mp.get_context("spawn")  # never fork the Spark JVM

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tensorbase_spark.engine import TensorBaseEngine
    from tensorbase_spark.sources.chnative import serve_native

    eng = TensorBaseEngine(spark)
    import shutil

    spark.sql("DROP DATABASE IF EXISTS ingest_mp_db CASCADE")
    shutil.rmtree("spark-warehouse/ingest_mp_db.db", ignore_errors=True)
    eng.sql("create database ingest_mp_db")
    eng.sql("use ingest_mp_db")
    srv, port = serve_native(eng, host="127.0.0.1")
    total = rows_per * n_blocks

    results = {}
    try:
        for n_proc, comp in ((1, True), (12, True), (1, False),
                             (12, False)):
            eng.sql("drop table if exists pt")
            eng.sql("drop table if exists pbuf")
            eng.sql(
                "create table pt (a Int64, b Int64) "
                "partition by rem(a, 100)"
            )
            eng.sql(
                "create table pbuf (a Int64, b Int64) ENGINE = Buffer("
                "currentDatabase(), pt, 16, 10, 100, 8, 4096, "
                "1000000, 10000000)"
            )
            shares = [list(range(w, n_blocks, n_proc))
                      for w in range(n_proc)]
            t0 = time.perf_counter()
            procs = [
                ctx.Process(target=_worker,
                            args=(port, comp, rows_per, share))
                for share in shares if share
            ]
            for p in procs:
                p.start()
            for p in procs:
                p.join()
            assert all(p.exitcode == 0 for p in procs), \
                [p.exitcode for p in procs]
            eng.sql("optimize table pbuf")
            dt = time.perf_counter() - t0
            got = eng.sql(
                "select count(*) as n, cast(sum(a) as bigint) as s "
                "from pt"
            ).collect()[0]
            ok = (got.n, got.s) == (total, total * (total - 1) // 2)
            results[(n_proc, comp)] = (dt, total / dt, ok)
            print(
                f"procs={n_proc:2d} lz4={int(comp)}  rows={total}  "
                f"wall={dt:.2f}s  rate={total / dt / 1e6:.3f} Mrows/s  "
                f"oracle_ok={ok}"
            )
    finally:
        srv.shutdown()
        srv.server_close()
    for comp in (True, False):
        r1, r12 = results[(1, comp)][1], results[(12, comp)][1]
        print(f"speedup 12-proc vs 1-proc (lz4={int(comp)}): "
              f"{r12 / r1:.2f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
