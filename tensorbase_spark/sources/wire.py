"""Wire front door: in-process HiveServer2 (Thrift JDBC/ODBC) endpoint.

The reference runs two wire protocols so stock clients can connect without
its own library — ClickHouse-native TCP (crates/server/src/server.rs:94-132)
and MySQL (crates/server_mysql/src/lib.rs:520).  The Spark-native analogue
is the Hive Thrift server Spark ships in-box: ``start_thrift_server`` binds
it to THIS session's catalog, so every engine-created database/table/view —
including partition-pruned engine tables and Distributed/Buffer alias views
— is queryable by any stock HiveServer2 client (beeline, JDBC, ODBC,
PyHive) over one socket.

Dialect note, same trade the reference makes: its MySQL port speaks MySQL
dialect, not BQL; this port speaks Spark SQL, not the ClickHouse dialect.
The CH-dialect surface stays ``TensorBaseEngine.sql`` (driver-side); the
wire surface serves standard SQL over the same catalog — which covers the
"connect with a stock tool and read the tables" story (SURVEY §7d scoped
this as stretch; VERDICT r6 #8).
"""

from __future__ import annotations

import socket

from pyspark.sql import SparkSession


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_THRIFT_PORT: int | None = None


def start_thrift_server(spark: SparkSession, port: int | None = None) -> int:
    """Start the HiveServer2 Thrift endpoint bound to ``spark``'s catalog.

    Returns the bound port.  IDEMPOTENT per process (r8): Spark hosts ONE
    thrift server per JVM, so the first call starts it and every later
    call — another test module, a registry query — reuses the recorded
    port.  The server lives until the JVM exits, the same lifetime as the
    reference's server task."""
    global _THRIFT_PORT
    if _THRIFT_PORT is not None:
        if port is not None and port != _THRIFT_PORT:
            raise ValueError(
                f"thrift server already on port {_THRIFT_PORT}; "
                f"cannot rebind to {port} (one server per JVM)"
            )
        # liveness probe: a recorded port can outlive its JVM (SparkSession
        # stopped and recreated) — only reuse a port that still accepts
        try:
            with socket.create_connection(("127.0.0.1", _THRIFT_PORT), 2):
                return _THRIFT_PORT
        except OSError:
            _THRIFT_PORT = None  # stale: fall through and start fresh
    port = port or _free_port()
    spark.conf.set("hive.server2.thrift.port", str(port))
    jvm = spark.sparkContext._jvm
    jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )
    _THRIFT_PORT = port
    return port


def beeline_path() -> str | None:
    """Path of the stock ``beeline`` client pyspark ships, if present."""
    import os

    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")
    return p if os.path.exists(p) else None
