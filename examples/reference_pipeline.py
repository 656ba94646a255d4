"""Runnable end-to-end demo: the reference's entire service, on Spark.

A user of ps2warpgate/streamclient runs: websocket subscribe →
MetagameEvent filter → key/projection → RabbitMQ publish → Mongo keyed
state (insert on start, delete on terminal, 5400 s purge) → Prometheus
metrics over HTTP. This script runs the same dataflow on this engine:

    replay/live source → typed projection → foreachBatch fan-out
      (per-partition bus publish + keyed upsert store)
      + StreamingQueryListener metrics served as Prometheus text.

Usage (from the repo root)::

    python examples/reference_pipeline.py [sf_dir] [work_dir]

Defaults: sf_dir=/root/testdata/sf0.001, work_dir=a temp dir. Prints
the Prometheus scrape, the final state store, and a sample of the
published wire payloads, then exits.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamclient_spark.session import get_spark
from streamclient_spark.sources.replay import EventReplayDataSource
from streamclient_spark.streaming import (
    collecting_publisher_factory,
    read_published,
)
from streamclient_spark.streaming import metrics as sm
from streamclient_spark.streaming.pipeline import (
    PipelineMetrics,
    metagame_pipeline,
)
from streamclient_spark.streaming.sinks import read_state_store


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="refpipe_"
    )
    spark = get_spark("reference-pipeline-demo")
    spark.dataSource.register(EventReplayDataSource)

    listener = sm.attach(spark)  # A17: service metrics
    server = sm.MetricsHttpServer(listener, port=0)  # Prometheus scrape
    port = server.start()

    metrics = PipelineMetrics()
    stream = (
        spark.readStream.format("event_replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batches", "4")
        .load()
    )
    q = metagame_pipeline(
        stream,
        make_publisher=collecting_publisher_factory(f"{work}/bus"),
        state_path=f"{work}/alert_store",
        checkpoint=f"{work}/ckpt",
        open_state="signup",
        metrics=metrics,
    )
    deadline = time.time() + 180
    while time.time() < deadline and metrics.total_events < 1000:
        time.sleep(0.5)
    q.processAllAvailable()
    q.stop()

    scrape = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/metrics", timeout=10
    ).read().decode()
    print("=== /metrics (Prometheus) ===")
    print("\n".join(l for l in scrape.splitlines() if not l.startswith("#")))

    print("=== alert state store (open alerts) ===")
    store = read_state_store(spark, f"{work}/alert_store")
    store.orderBy("id").show(10, truncate=False)

    published = read_published(f"{work}/bus")
    print(f"=== bus: {len(published)} wire payloads; first ===")
    print(published[0].decode()[:200])

    server.stop()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
