"""Wire front door: a STOCK HiveServer2 client (the beeline pyspark ships)
connects over a real TCP socket and reads engine-created tables — the
Spark-native analogue of the reference's dual wire protocols
(crates/server/src/server.rs:94-132, crates/server_mysql/src/lib.rs:520).
"""

from __future__ import annotations

import subprocess
import time
import uuid

import pytest


@pytest.fixture(scope="module")
def thrift_port(spark):
    from tensorbase_spark.sources.wire import beeline_path, start_thrift_server

    if beeline_path() is None:
        pytest.skip("beeline client not shipped with this pyspark")
    port = start_thrift_server(spark)
    time.sleep(2)  # server warmup before the first connection
    yield port


def _beeline(port: int, db: str, sql: str) -> str:
    from tensorbase_spark.sources.wire import beeline_path

    r = subprocess.run(
        [
            beeline_path(),
            "-u",
            f"jdbc:hive2://localhost:{port}/{db}",
            "--silent=true",
            "--outputformat=csv2",
            "-e",
            sql,
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert r.returncode == 0, r.stderr[-500:]
    return r.stdout


def test_stock_jdbc_client_reads_engine_tables(spark, thrift_port):
    """beeline (stock JDBC) sees an engine-created partitioned table, a
    registry-style aggregate over it, and the engine's alias view — over
    the socket, zero engine code on the client side."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    db = f"wire_{uuid.uuid4().hex[:8]}"
    eng.sql(f"create database {db}")
    eng.sql(f"use {db}")
    try:
        eng.sql(
            "create table wt(a Int64, b String) partition by rem(a, 4)"
        )
        eng.sql("insert into wt values (1, 'x'), (2, 'y'), (3, 'z')")
        eng.sql(
            "create table wt_dist(a Int64, b String) "
            f"ENGINE = Distributed(c1, {db}, wt, rand())"
        )
        out = _beeline(thrift_port, db, "select a, b from wt order by a")
        assert "1,x" in out and "2,y" in out and "3,z" in out
        agg = _beeline(
            thrift_port, db,
            "select count(*) as n, sum(a) as s from wt where a % 4 != 0",
        )
        assert "3,6" in agg
        via_alias = _beeline(
            thrift_port, db, "select count(*) as n from wt_dist"
        )
        assert "\n3" in via_alias.replace("\r", "")
    finally:
        spark.catalog.setCurrentDatabase("default")
        eng.sql(f"drop database if exists {db}")


def test_all_front_doors_share_one_catalog(spark):
    """All four wire front doors — ClickHouse native TCP, MySQL
    protocol, HTTP, and HiveServer2 Thrift — serve the SAME engine
    catalog concurrently: a table created over the native wire is read
    back over the MySQL wire and the HTTP interface (which also inserts
    a row the native side then sees), then through a remote() federation
    against the Thrift endpoint, with identical values.  (The reference
    runs its two protocols against one BMS instance the same way,
    server.rs + mysql_server.rs.)"""
    import uuid as _uuid

    from tensorbase_spark.engine import TensorBaseEngine
    from tensorbase_spark.sources import external
    from tensorbase_spark.sources.chnative import NativeClient, serve_native
    from tensorbase_spark.sources.httpwire import HttpClient, serve_http
    from tensorbase_spark.sources.mysqlwire import MySQLClient, serve_mysql
    from tensorbase_spark.sources.wire import start_thrift_server

    eng = TensorBaseEngine(spark)
    db = f"fd_{_uuid.uuid4().hex[:8]}"
    eng.sql(f"create database {db}")
    eng.sql(f"use {db}")
    nsrv, nport = serve_native(eng)
    msrv, mport = serve_mysql(eng)
    hsrv, hport = serve_http(eng)
    try:
        with NativeClient(port=nport) as nc:
            nc.execute("create table fd_t (k Int64, v String)")
            nc.execute("insert into fd_t values (1,'a'), (2,'b'), (3,'c')")
        with MySQLClient(port=mport, database=db) as mc:
            _, rows = mc.query("select k, v from fd_t order by k")
            assert rows == [(1, "a"), (2, "b"), (3, "c")]
        with HttpClient(port=hport, database=db) as hc:
            _n, _t, hrows = hc.execute("select k, v from fd_t order by k")
            assert hrows == [(1, "a"), (2, "b"), (3, "c")]
            hc.insert_rows("fd_t", ["k", "v"], [(4, "d")])
        with NativeClient(port=nport) as nc:
            _, back = nc.execute(
                "select count(*) as n, max(k) as mk from fd_t")
            assert [tuple(r) for r in back] == [(4, 4)]
        port = start_thrift_server(spark)
        r = external.remote(spark, f"jdbc:hive2://localhost:{port}/{db}", "fd_t")
        assert sorted((x.k, x.v) for x in r.collect()) == [
            (1, "a"), (2, "b"), (3, "c"), (4, "d"),
        ]
        # and the mysql:// federation path sees the same rows
        r2 = external.remote(spark, f"mysql://127.0.0.1:{mport}/{db}", "fd_t")
        assert sorted((x.k, x.v) for x in r2.collect()) == [
            (1, "a"), (2, "b"), (3, "c"), (4, "d"),
        ]
    finally:
        for srv in (nsrv, msrv, hsrv):
            srv.shutdown()
            srv.server_close()
        spark.catalog.setCurrentDatabase("default")
        eng.sql(f"drop database if exists {db}")
