"""S5 — executed socket-source test (``env.socketTextStream`` +
windowed word count, ``WordCount.scala:40-47``).

Unlike the Kafka sources (no broker in the sandbox, contract-pinned in
``test_kafka_contract.py``), a socket peer needs no infrastructure: an
in-process TCP server thread drips fixture lines into
``socket_source`` and a complete-mode word count must converge to the
exact totals. This is the one reference source that can be EXECUTED
end-to-end in the sandbox.
"""

from __future__ import annotations

import socket
import threading
import time

from pyspark.sql import functions as F

from fink_joiner_spark.sources.streaming import socket_source

_LINES = ["spark flink", "spark", "join window join"]
_WANT = {"spark": 2, "flink": 1, "join": 2, "window": 1}


def test_socket_source_executed_wordcount(spark, tmp_path):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop_evt = threading.Event()

    def serve() -> None:
        conn, _ = srv.accept()
        try:
            for ln in _LINES:
                conn.sendall((ln + "\n").encode())
            # hold the connection open until the query is done — the
            # socket source treats EOF as source failure, not end-of-data
            stop_evt.wait(timeout=120)
        finally:
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    lines = socket_source(spark, "127.0.0.1", port)
    counts = (
        lines.select(F.explode(F.split("value", " ")).alias("word"))
        .groupBy("word")
        .count()
    )
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sock_wc")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        got: dict[str, int] = {}
        deadline = time.time() + 90
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                r["word"]: r["count"]
                for r in spark.sql("SELECT * FROM sock_wc").collect()
            }
            if got == _WANT:
                break
            time.sleep(0.25)
        assert got == _WANT, got
    finally:
        stop_evt.set()
        q.stop()
        srv.close()
