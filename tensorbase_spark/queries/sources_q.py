"""Driver-facing queries for the source surface (SURVEY §2.2): numbers()
table function, CSV and NDJSON ingestion with declared schemas, and the
remote() loopback path.

The file-ingestion queries stage a deterministic extract of the fixture into
/tmp, read it back through the declared-schema reader, and aggregate; the
oracle recomputes the same aggregate straight from the parquet — a hash
match proves the text round-trip preserves values exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tensorbase_spark.queries import Query
from tensorbase_spark.sources import external
from tensorbase_spark.sources.tables import load_table

_STAGE = "/tmp/tbs_sources_stage"


def numbers_table_function(spark, sf_dir):
    n = external.numbers(spark, 100000)
    return n.filter((F.col("number") % 7) == 3).agg(
        F.count("*").alias("n"),
        F.sum("number").alias("s"),
        F.min("number").alias("lo"),
        F.max("number").alias("hi"),
    )


NUMBERS_ORACLE = """
SELECT count(*) AS n, CAST(sum(range) AS BIGINT) AS s,
       min(range) AS lo, max(range) AS hi
FROM range(100000) WHERE range % 7 = 3
"""


def _stage_dir(sf_dir: str, kind: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return f"{_STAGE}/{tag}/{kind}"


def csv_ingest_roundtrip(spark, sf_dir):
    """supplier -> CSV (header, overwrite) -> declared-schema read -> agg."""
    d = _stage_dir(sf_dir, "csv")
    src = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal", "s_name"
    )
    src.coalesce(1).write.mode("overwrite").option("header", True).csv(d)
    back = external.read_csv(
        spark,
        d,
        [
            ("s_suppkey", "Int64"),
            ("s_nationkey", "Int64"),
            ("s_acctbal", "Float64"),
            ("s_name", "String"),
        ],
        header=True,
    )
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n"), F.round(F.sum("s_acctbal"), 2).alias("bal")
    )


CSV_INGEST_ORACLE = """
SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS bal
FROM supplier GROUP BY s_nationkey
"""


def ndjson_ingest_roundtrip(spark, sf_dir):
    """events subset -> NDJSON -> declared-schema read -> agg."""
    d = _stage_dir(sf_dir, "ndjson")
    src = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    src.coalesce(1).write.mode("overwrite").json(d)
    back = external.read_ndjson(
        spark,
        d,
        [("event_id", "Int64"), ("event_type", "String"), ("value", "Nullable(Float64)")],
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v")
    )


NDJSON_INGEST_ORACLE = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS v
FROM events GROUP BY event_type
"""


AVRO_SCHEMA = {
    "type": "record",
    "name": "orders_slice",
    "fields": [
        {"name": "o_orderkey", "type": "long"},
        {"name": "o_custkey", "type": "long"},
        {"name": "o_orderstatus", "type": "string"},
        {"name": "o_totalprice", "type": "double"},
        {"name": "o_orderdate", "type": {"type": "long", "logicalType": "timestamp-micros"}},
    ],
}


def avro_ingest_roundtrip(spark, sf_dir):
    """The fork's AvroExec equivalent (physical_plan/file_format/avro.rs:39),
    end to end and fully distributed: orders -> per-partition Avro object
    containers encoded on EXECUTORS (sources/avro_py.py pure-Python codec;
    one partition writes codec=null, the other deflate, so both decode
    paths get driver coverage) -> external.read_avro (binaryFile +
    mapInPandas decode, files as the parallel grain) -> aggregate.  The
    oracle recomputes the aggregate straight from parquet, so a hash match
    proves typed values (incl. timestamps) survive the Avro round trip."""
    import shutil

    d = _stage_dir(sf_dir, "avro")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )

    def write_part(batches):
        import pandas as pd
        from pyspark import TaskContext

        from tensorbase_spark.sources import avro_py

        rows = []
        for pdf in batches:
            pdf = pdf.assign(
                o_orderdate=pdf["o_orderdate"].astype("int64") // 1000
            )
            rows.extend(pdf.to_dict("records"))
        pid = TaskContext.get().partitionId()
        if rows:
            codec = "deflate" if pid % 2 == 0 else "null"
            with open(f"{d}/part-{pid:05d}.avro", "wb") as fh:
                fh.write(avro_py.write_container(AVRO_SCHEMA, rows, codec=codec))
        yield pd.DataFrame({"n": [len(rows)]})

    src.repartition(2, "o_orderkey").mapInPandas(write_part, "n long").collect()
    back = external.read_avro(spark, d)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.min("o_orderdate").alias("first_ts"),
        F.max("o_orderkey").alias("max_key"),
    )


AVRO_INGEST_ORACLE = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS revenue,
       CAST(min(o_orderdate) AS TIMESTAMP) AS first_ts,
       max(o_orderkey) AS max_key
FROM orders GROUP BY o_orderstatus
"""


def remote_loopback(spark, sf_dir):
    """remote() federation through the loopback scheme: register the nation
    fixture as a catalog view, read it back via remote(), join-aggregate."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("tb_remote_nation")
    r = external.remote(spark, "local:", "tb_remote_nation")
    return r.groupBy("n_regionkey").agg(F.count("*").alias("n_nations"))


REMOTE_ORACLE = """
SELECT n_regionkey, count(*) AS n_nations FROM nation GROUP BY n_regionkey
"""


def remote_jdbc_federation(spark, sf_dir):
    """GENUINE JDBC federation for remote() (reference
    crates/runtime/src/read.rs:151-228, crates/engine/src/remote.rs:8,49):
    the supplier fixture is first published into an embedded Derby database
    (a real JDBC server-side store, ships inside Spark's own classpath — no
    vendored jars), then remote() reads it back over jdbc: and joins it
    with the local nation table.  A hash match proves typed values survive
    the Spark->JDBC->Spark round trip; the JDBC source also pushes the
    filter to the remote, which is more than the reference's
    full-scatter-then-concat."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    url = f"jdbc:derby:/tmp/tbs_derby/{tag};create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    src = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "supplier_remote")
        .option("driver", drv)
        .mode("overwrite")
        .save()
    )
    r = external.remote(spark, url, "supplier_remote", driver=drv)
    nation = load_table(spark, sf_dir, "nation")
    return (
        r.filter(F.col("s_acctbal") > 0)
        .join(F.broadcast(nation), r.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
    )


REMOTE_JDBC_ORACLE = """
SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal > 0
GROUP BY n_name
"""


def remote_thrift_federation(spark, sf_dir):
    """remote() pointed at the engine's OWN Thrift/HiveServer2 endpoint
    over the stock hive-jdbc driver already on Spark's classpath — the
    reference's remote() story (crates/engine/src/remote.rs:8,49,
    read.rs:151-228) proven against the engine's own wire server rather
    than a third-party store (Derby covers that, `remote_jdbc_federation`):
    an engine-created table is served over a genuine TCP socket and read
    back through the JDBC datasource, then joined with a local dimension.
    Column-name round-trip correctness is the load-bearing part — Spark's
    JDBC source double-quotes pushed column lists, which the Spark-SQL
    dialect on the server side reads as string literals unless the ANSI
    identifier conf rides in the hive2 URL (sources/external.py remote)."""
    import time

    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.sources.wire import start_thrift_server

    eng = _fresh_engine(spark, sf_dir, "tft")
    db = spark.catalog.currentDatabase()
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("tft_src")
    eng.sql(
        "create table tft_supplier (sk Int64, nk Int64, bal Float64)"
    )
    eng.sql(
        "insert into tft_supplier select s_suppkey, s_nationkey, s_acctbal "
        "from tft_src"
    )
    port = start_thrift_server(spark)
    time.sleep(0.5)  # only the very first call needs warmup; cheap after
    r = external.remote(
        spark, f"jdbc:hive2://localhost:{port}/{db}", "tft_supplier"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        r.filter(F.col("bal") > 0)
        .join(F.broadcast(nation), r.nk == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("bal"), 2).alias("total_bal"),
        )
    )


REMOTE_THRIFT_ORACLE = """
SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal > 0
GROUP BY n_name
"""


def wire_native_roundtrip(spark, sf_dir):
    """ClickHouse NATIVE wire protocol round trip (the reference's primary
    front door: crates/server/src/server.rs:94-132, packet dispatch
    crates/runtime/src/ch/messages.rs:28-202, block codec
    crates/runtime/src/ch/blocks.rs:122-541).  A lineitem extract goes out
    over a REAL TCP socket as LZ4-framed native blocks (client encode ->
    server decode -> insert_df), then an aggregate comes BACK over the same
    socket (server encode -> client decode); the returned DataFrame is
    built from the wire-decoded values, so the oracle hash certifies the
    full both-ends codec — varints, CityHash128 checksums, LZ4 frames,
    column serialization — value-exactly."""
    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.sources.chnative import NativeClient, serve_native

    eng = _fresh_engine(spark, sf_dir, "wnr")
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_orderkey") % 37) == 0)
        .select(
            F.col("l_orderkey").cast("long"),
            F.col("l_returnflag").cast("string"),
            F.col("l_quantity").cast("double"),
            F.col("l_shipdate").cast("date"),
        )
        .collect()
    )
    srv, port = serve_native(eng)
    try:
        with NativeClient(port=port, compression=True) as c:
            c.execute(
                "create table wnr_line (ok Int64, flag String, "
                "qty Float64, d Date)"
            )
            c.insert(
                "wnr_line",
                [
                    ("ok", "Int64", [r[0] for r in rows]),
                    ("flag", "String", [r[1] for r in rows]),
                    ("qty", "Float64", [r[2] for r in rows]),
                    ("d", "Date", [r[3] for r in rows]),
                ],
            )
            _, got = c.execute(
                "select flag, count(*) as n, "
                "cast(sum(cast(qty as bigint)) as bigint) as qty_sum, "
                "min(d) as first_ship, max(d) as last_ship "
                "from wnr_line group by flag order by flag"
            )
    finally:
        srv.shutdown()
        srv.server_close()
    return spark.createDataFrame(
        [tuple(r) for r in got],
        "flag string, n bigint, qty_sum bigint, first_ship date, last_ship date",
    )


def remote_mysql_federation(spark, sf_dir):
    """remote() over the MYSQL wire protocol — the reference's remote()
    speaks MySQL natively (crates/engine/src/remote.rs:49); here the
    engine serves its own MySQL endpoint (sources/mysqlwire.py) and
    remote('mysql://...') reads a published table back through it, then
    joins with the local nation dim.  Engine -> MySQL wire -> engine,
    no JDBC jar involved; typed values (Int64/Float64) survive the
    text-protocol round trip, certified by the value hash."""
    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.sources.mysqlwire import serve_mysql

    eng = _fresh_engine(spark, sf_dir, "rmf")
    db = spark.catalog.currentDatabase()
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("rmf_src")
    eng.sql("create table rmf_supplier (sk Int64, nk Int64, bal Float64)")
    eng.sql(
        "insert into rmf_supplier select s_suppkey, s_nationkey, s_acctbal "
        "from rmf_src"
    )
    srv, port = serve_mysql(eng)
    try:
        r = external.remote(
            spark, f"mysql://127.0.0.1:{port}/{db}", "rmf_supplier"
        )
    finally:
        srv.shutdown()
        srv.server_close()
    nation = load_table(spark, sf_dir, "nation")
    return (
        r.filter(F.col("bal") > 0)
        .join(F.broadcast(nation), r.nk == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("bal"), 2).alias("total_bal"),
        )
    )


REMOTE_MYSQL_ORACLE = """
SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal > 0
GROUP BY n_name
"""


def wire_mysql_roundtrip(spark, sf_dir):
    """MySQL wire protocol round trip (the reference's second stock front
    door: crates/server_mysql/src/lib.rs:520 AsyncMysqlIntermediary,
    text resultset crates/server_mysql/src/resultset.rs:103-349, query
    dispatch crates/runtime/src/mysql/mod.rs:102-147).  An orders extract
    goes out over a REAL TCP socket as text-protocol INSERT VALUES
    batches (client frame -> server parse -> engine insert), then an
    aggregate comes BACK over the same socket as a text resultset (server
    lenenc encode -> client decode by column type); the returned
    DataFrame is built from the wire-decoded values, so the oracle hash
    certifies the full both-ends path — packet framing, handshake,
    COM_QUERY dispatch, column definitions, lenenc text rows —
    value-exactly."""
    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.sources.mysqlwire import MySQLClient, serve_mysql

    eng = _fresh_engine(spark, sf_dir, "wmr")
    rows = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") % 41) == 0)
        .select(
            F.col("o_orderkey").cast("long"),
            F.col("o_orderstatus").cast("string"),
            F.col("o_totalprice").cast("double"),
            F.col("o_orderdate").cast("date"),
        )
        .collect()
    )
    srv, port = serve_mysql(eng)
    try:
        with MySQLClient(port=port) as c:
            c.query_drop(
                "create table wmr_orders (ok Int64, status String, "
                "price Float64, d Date)"
            )
            for i in range(0, len(rows), 500):
                chunk = rows[i : i + 500]
                values = ",".join(
                    f"({r[0]},'{r[1]}',{r[2]!r},'{r[3]}')" for r in chunk
                )
                c.query_drop(f"insert into wmr_orders values {values}")
            _, got = c.query(
                "select status, count(*) as n, "
                "cast(sum(cast(price as bigint)) as bigint) as price_sum, "
                "min(d) as first_order, max(d) as last_order "
                "from wmr_orders group by status order by status"
            )
    finally:
        srv.shutdown()
        srv.server_close()
    return spark.createDataFrame(
        [tuple(r) for r in got],
        "status string, n bigint, price_sum bigint, "
        "first_order date, last_order date",
    )


WIRE_MYSQL_ORACLE = """
SELECT o_orderstatus AS status, count(*) AS n,
       CAST(sum(CAST(trunc(o_totalprice) AS BIGINT)) AS BIGINT) AS price_sum,
       min(CAST(o_orderdate AS DATE)) AS first_order,
       max(CAST(o_orderdate AS DATE)) AS last_order
FROM orders WHERE o_orderkey % 41 = 0
GROUP BY o_orderstatus
"""


def remote_native_federation(spark, sf_dir):
    """remote() over the CH NATIVE protocol — the reference remote()'s
    PRIMARY transport (crates/engine/src/remote.rs:8 connects with the
    clickhouse-rs native client; block concat read.rs:151-228).  Both
    halves run against the engine's own native endpoint
    (sources/chnative.py): INSERT INTO FUNCTION remote('ch://...')
    pushes a part extract out as typed LZ4-framed columnar blocks, then
    remote('ch://...') reads the table back over the same wire and
    aggregates by brand.  Engine -> native wire -> engine; the value
    hash certifies the full block codec round trip."""
    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.sources.chnative import serve_native

    eng = _fresh_engine(spark, sf_dir, "rnf")
    db = spark.catalog.currentDatabase()
    load_table(spark, sf_dir, "part").filter(
        (F.col("p_partkey") % 7) == 0
    ).createOrReplaceTempView("rnf_src")
    eng.sql("create table rnf_part (pk Int64, brand String, price Float64)")
    srv, port = serve_native(eng)
    try:
        eng.sql(
            f"insert into function remote('ch://127.0.0.1:{port}/{db}', "
            "rnf_part) select p_partkey as pk, p_brand as brand, "
            "p_retailprice as price from rnf_src"
        )
        r = external.remote(spark, f"ch://127.0.0.1:{port}/{db}", "rnf_part")
        r = r.localCheckpoint(eager=True)  # drain before the server stops
    finally:
        srv.shutdown()
        srv.server_close()
    return (
        r.groupBy("brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum("price"), 2).alias("total_price"),
            F.max("pk").alias("max_pk"),
        )
    )


def remote_sharded_scatter(spark, sf_dir):
    """remote() SHARD PATTERNS — CH's scatter-gather address lists
    (the reference's remote() takes one address, read.rs:151-228; the
    upstream pattern grammar adds comma lists and {a,b}/{1..N} braces).
    The supplier table splits by s_suppkey parity into two shard
    databases served by TWO independent native TCP endpoints; one
    remote() call with a brace-alternation address scatters to both,
    unions the blocks, and aggregates — per-shard partial aggregation is
    Spark's normal unionByName push-down, the 100 TB scatter shape."""
    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.sources.chnative import serve_native

    eng1 = _fresh_engine(spark, sf_dir, "shard1")
    db1 = spark.catalog.currentDatabase()
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("rss_src")
    eng1.sql("create table rss_sup (sk Int64, nk Int64, bal Float64)")
    eng1.sql(
        "insert into rss_sup select s_suppkey, s_nationkey, s_acctbal "
        "from rss_src where s_suppkey % 2 = 0"
    )
    eng2 = _fresh_engine(spark, sf_dir, "shard2")
    db2 = spark.catalog.currentDatabase()
    eng2.sql("create table rss_sup (sk Int64, nk Int64, bal Float64)")
    eng2.sql(
        "insert into rss_sup select s_suppkey, s_nationkey, s_acctbal "
        "from rss_src where s_suppkey % 2 = 1"
    )
    srv1, p1 = serve_native(eng1)
    srv2, p2 = serve_native(eng2)
    try:
        r = external.remote(
            spark,
            f"ch://127.0.0.1:{p1}/{db1},ch://127.0.0.1:{p2}/{db2}",
            "rss_sup",
        )
        r = r.localCheckpoint(eager=True)
    finally:
        for s in (srv1, srv2):
            s.shutdown()
            s.server_close()
    nation = load_table(spark, sf_dir, "nation")
    return (
        r.join(F.broadcast(nation), r.nk == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("bal"), 2).alias("total_bal"),
            F.max("sk").alias("max_sk"),
        )
    )


REMOTE_SHARDED_ORACLE = """
SELECT n_name, count(*) AS n_suppliers,
       round(sum(s_acctbal), 2) AS total_bal,
       CAST(max(s_suppkey) AS BIGINT) AS max_sk
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


REMOTE_NATIVE_ORACLE = """
SELECT p_brand AS brand, count(*) AS n_parts,
       round(sum(p_retailprice), 2) AS total_price,
       CAST(max(p_partkey) AS BIGINT) AS max_pk
FROM part WHERE p_partkey % 7 = 0
GROUP BY p_brand
"""


def wire_http_roundtrip(spark, sf_dir):
    """HTTP front-door round trip (upstream-CH's most used interface —
    the beyond-reference protocol next to the reference's native TCP
    server, crates/server/src/server.rs:94-132, and MySQL server,
    crates/server_mysql/).  A customer extract goes out over a REAL HTTP
    socket as a JSONEachRow POST body (client encode -> server parse ->
    typed insert), then an aggregate comes BACK as
    TabSeparatedWithNamesAndTypes (server escape/encode -> client typed
    decode); the returned DataFrame is built from the wire-decoded
    values, so the oracle hash certifies the full both-ends path —
    query-in-URL dispatch, INSERT body decoding, TSV escapes, CH type
    names, chunked streaming — value-exactly."""
    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.sources.httpwire import HttpClient, serve_http

    eng = _fresh_engine(spark, sf_dir, "whr")
    rows = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 11) == 0)
        .select(
            F.col("c_custkey").cast("long"),
            F.col("c_mktsegment").cast("string"),
            F.col("c_acctbal").cast("double"),
        )
        .collect()
    )
    srv, port = serve_http(eng)
    try:
        with HttpClient(port=port) as c:
            c.execute(
                "create table whr_cust (ck Int64, seg String, bal Float64)"
            )
            for i in range(0, len(rows), 2000):
                chunk = rows[i : i + 2000]
                c.insert_rows(
                    "whr_cust", ["ck", "seg", "bal"],
                    [tuple(r) for r in chunk],
                )
            _, _, got = c.execute(
                "select seg, count(*) as n, "
                "cast(sum(cast(bal as bigint)) as bigint) as bal_sum, "
                "min(ck) as first_ck, max(ck) as last_ck "
                "from whr_cust group by seg order by seg"
            )
    finally:
        srv.shutdown()
        srv.server_close()
    return spark.createDataFrame(
        [tuple(r) for r in got],
        "seg string, n bigint, bal_sum bigint, first_ck bigint, "
        "last_ck bigint",
    )


WIRE_HTTP_ORACLE = """
SELECT c_mktsegment AS seg, count(*) AS n,
       CAST(sum(CAST(trunc(c_acctbal) AS BIGINT)) AS BIGINT) AS bal_sum,
       CAST(min(c_custkey) AS BIGINT) AS first_ck,
       CAST(max(c_custkey) AS BIGINT) AS last_ck
FROM customer WHERE c_custkey % 11 = 0
GROUP BY c_mktsegment
"""


def url_http_federation(spark, sf_dir):
    """url() table function over the engine's OWN HTTP endpoint, both
    halves (upstream-CH url(); the reference's closest shape is
    remote(), crates/engine/src/remote.rs:49): INSERT INTO FUNCTION
    url('http://...') POSTs formatted rows out over the wire into a
    second table, then url('http://...?query=...FORMAT JSONEachRow')
    reads an extract back through the same endpoint and joins it with
    the local nation dim.  Engine -> HTTP wire -> engine, no driver jar
    involved; typed values survive the JSONEachRow round trip
    (64-bit quoting disabled via the public setting), certified by the
    value hash."""
    from urllib.parse import quote as _q

    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.sources.httpwire import serve_http

    eng = _fresh_engine(spark, sf_dir, "uhf")
    db = spark.catalog.currentDatabase()
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("uhf_src")
    eng.sql("create table uhf_supplier (sk Int64, nk Int64, bal Float64)")
    srv, port = serve_http(eng)
    try:
        ins = _q(f"INSERT INTO {db}.uhf_supplier FORMAT JSONEachRow")
        eng.sql(
            f"insert into function url('http://127.0.0.1:{port}/"
            f"?query={ins}', 'JSONEachRow') "
            "select s_suppkey as sk, s_nationkey as nk, s_acctbal as bal "
            "from uhf_src"
        )
        sel = _q(
            f"SELECT sk, nk, bal FROM {db}.uhf_supplier "
            "WHERE bal > 0 FORMAT JSONEachRow"
        )
        r = eng.sql(
            f"select sk, nk, bal from url('http://127.0.0.1:{port}/"
            f"?query={sel}&output_format_json_quote_64bit_integers=0', "
            "'JSONEachRow')"
        )
        r = r.localCheckpoint(eager=True)  # drain before the server stops
    finally:
        srv.shutdown()
        srv.server_close()
    nation = load_table(spark, sf_dir, "nation")
    return (
        r.join(F.broadcast(nation), r.nk == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("bal"), 2).alias("total_bal"),
        )
    )


URL_HTTP_ORACLE = """
SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal > 0
GROUP BY n_name
"""


WIRE_NATIVE_ORACLE = """
SELECT l_returnflag AS flag, count(*) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
       min(CAST(l_shipdate AS DATE)) AS first_ship,
       max(CAST(l_shipdate AS DATE)) AS last_ship
FROM lineitem WHERE l_orderkey % 37 = 0
GROUP BY l_returnflag
"""


QUERIES = {
    "numbers_table_function": Query(numbers_table_function, NUMBERS_ORACLE, ("sources",)),
    "csv_ingest_roundtrip": Query(csv_ingest_roundtrip, CSV_INGEST_ORACLE, ("sources",)),
    "ndjson_ingest_roundtrip": Query(ndjson_ingest_roundtrip, NDJSON_INGEST_ORACLE, ("sources",)),
    "avro_ingest_roundtrip": Query(avro_ingest_roundtrip, AVRO_INGEST_ORACLE, ("sources",)),
    "remote_loopback": Query(remote_loopback, REMOTE_ORACLE, ("sources",)),
    "remote_jdbc_federation": Query(remote_jdbc_federation, REMOTE_JDBC_ORACLE, ("sources",)),
    "wire_native_roundtrip": Query(
        wire_native_roundtrip, WIRE_NATIVE_ORACLE, ("sources", "wire")
    ),
    "wire_mysql_roundtrip": Query(
        wire_mysql_roundtrip, WIRE_MYSQL_ORACLE, ("sources", "wire")
    ),
    "remote_mysql_federation": Query(
        remote_mysql_federation, REMOTE_MYSQL_ORACLE, ("sources", "wire")
    ),
    "wire_http_roundtrip": Query(
        wire_http_roundtrip, WIRE_HTTP_ORACLE, ("sources", "wire")
    ),
    "url_http_federation": Query(
        url_http_federation, URL_HTTP_ORACLE, ("sources", "wire")
    ),
    "remote_native_federation": Query(
        remote_native_federation, REMOTE_NATIVE_ORACLE, ("sources", "wire")
    ),
    "remote_sharded_scatter": Query(
        remote_sharded_scatter, REMOTE_SHARDED_ORACLE, ("sources", "wire")
    ),
    "remote_thrift_federation": Query(
        remote_thrift_federation, REMOTE_THRIFT_ORACLE, ("sources", "wire")
    ),
}
