"""Measured streaming throughput for the live pipeline (VERDICT r7 #6).

Exports the sf0.1 events table into a 32-shard JSONL journal (the
FileJournalTransport wire format), then runs the FULL live pipeline —
partitioned journal source → projection → lifecycle fold → bus publish
+ idempotent state upsert, all checkpointed — and reports rows/sec and
per-microbatch latency once every journaled event has flowed through.

This turns the scale claim ("a 32-shard partitioned reader ingests in
parallel, vs the reference's single asyncio socket,
ess_client.py:121-124") into a number. The journal is pre-written so
the measurement is pipeline throughput, not producer speed; shards are
read in parallel by the partitioned source (one task per shard slice).

Usage:
    python tools/stream_throughput.py [sf_dir] [n_shards] [cap]

``cap`` (default 1000) is the per-shard per-trigger intake cap
(``max_per_shard_batch``), so the pre-written backlog drains as
bounded microbatches — the steady-state shape — instead of one giant
batch; pass 0 to disable the cap and measure single-batch drain.

Emits one JSON line:
    {"rows": N, "wall_sec": s, "rows_per_sec": r, "batches": b,
     "mean_batch_sec": m, "max_batch_sec": x, "shards": k}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    sys.path.insert(0, "/root/repo")
    from streamclient_spark.session import get_spark
    from streamclient_spark.sources.replay import EventReplayDataSource
    from streamclient_spark.streaming import (
        collecting_publisher_factory,
        read_state_store,
    )
    from streamclient_spark.streaming.pipeline import (
        PipelineMetrics,
        metagame_pipeline,
    )

    spark = get_spark("streamclient-spark-stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_tp_")
    journal = os.path.join(work, "journal")
    os.makedirs(journal)

    # ---- produce the journal: every sf event, sharded by event_id ----
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT event_id, epoch(CAST(ts AS TIMESTAMP)) AS ts, user_id,
               event_type, value, props
        FROM read_parquet('{sf_dir}/events.parquet')
        ORDER BY event_id
        """
    ).fetchall()
    con.close()
    n_rows = len(rows)
    shard_files = [
        open(os.path.join(journal, f"shard-{k}.jsonl"), "w")
        for k in range(n_shards)
    ]
    try:
        for r in rows:
            e = {
                "event_id": r[0],
                "ts": float(r[1]),
                "user_id": r[2],
                "event_type": r[3],
                "value": r[4],
                "props": r[5],
            }
            shard_files[r[0] % n_shards].write(json.dumps(e) + "\n")
    finally:
        for f in shard_files:
            f.close()

    # ---- run the live pipeline until the journal is drained ----
    spark.dataSource.register(EventReplayDataSource)
    reader = (
        spark.readStream.format("event_replay")
        .option("mode", "live")
        .option(
            "transport",
            "streamclient_spark.sources.transport:file_journal_transport",
        )
        .option("journal_dir", journal)
    )
    if cap:
        reader = reader.option("max_per_shard_batch", str(cap))
    stream = reader.load()
    metrics = PipelineMetrics()
    t0 = time.perf_counter()
    q = metagame_pipeline(
        stream,
        make_publisher=collecting_publisher_factory(
            os.path.join(work, "bus")
        ),
        state_path=os.path.join(work, "store"),
        checkpoint=os.path.join(work, "ckpt"),
        open_state="signup",
        metrics=metrics,
    )
    batch_secs: dict[str, float] = {}

    def harvest() -> None:
        for p in q.recentProgress:
            if p.get("numInputRows"):
                d = p.get("durationMs") or {}
                batch_secs[str(p.get("batchId"))] = (
                    float(d.get("triggerExecution", 0)) / 1e3
                )

    try:
        deadline = time.monotonic() + 600
        while metrics.total_events < n_rows:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"drained {metrics.total_events}/{n_rows} in 600 s"
                )
            harvest()
            time.sleep(0.2)
        wall = time.perf_counter() - t0
        harvest()
    finally:
        q.stop()
        q.awaitTermination(30)

    n_state = read_state_store(spark, os.path.join(work, "store")).count()
    secs = list(batch_secs.values())
    out = {
        "rows": metrics.total_events,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(metrics.total_events / wall),
        "batches": metrics.batches,
        "mean_batch_sec": round(sum(secs) / len(secs), 3) if secs else None,
        "max_batch_sec": round(max(secs), 3) if secs else None,
        "cap_per_shard": cap or None,
        "shards": n_shards,
        "state_rows": n_state,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
