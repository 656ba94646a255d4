"""Message-bus publisher adapters for the bus sink.

The reference publishes to a RabbitMQ DIRECT exchange with persistent
delivery (``/root/reference/services/RabbitService.py:14-35``). The
engine's bus sink (:func:`streamclient_spark.streaming.sinks.
bus_sink_batch`) takes a *publisher factory* invoked once per
partition task on the executors; this module provides the two
production factories:

- :func:`amqp_publisher_factory` — RabbitMQ parity: one connection +
  channel per partition task, DIRECT exchange, persistent delivery
  mode, ``application/json`` content type — the per-batch bulk form of
  ``RabbitService.publish``. Needs the ``pika`` client at *executor*
  import time; this container doesn't ship it, so the import is
  deferred to first use and fails with a clear message (the factory
  itself constructs fine, and everything above it is exercised by the
  file-collector factory in tests).
- :func:`kafka_sink` — the canonical Spark idiom: skip the Python
  publisher entirely and hand the wire batch to
  ``writeStream.format("kafka")`` (JVM producer, broker-side
  batching). Requires the spark-sql-kafka package on the classpath;
  the wrapper only shapes the plan (``to_json`` payload → ``value``)
  and defers the dependency check to query start.

Both adapters keep the at-least-once contract documented on the sink:
a retried microbatch republishes; consumers dedupe on the event key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamclient_spark.streaming.sinks import Publisher, PublisherFactory


def amqp_publisher_factory(
    url: str,
    exchange: str = "events",
    routing_key: str = "metagame",
) -> PublisherFactory:
    """RabbitMQ publisher factory (reference parity:
    ``RabbitService.setup``/``publish``). The returned factory runs on
    executors: each partition task opens one connection/channel,
    declares the durable DIRECT exchange, publishes its payload batch
    with persistent delivery, and closes. Raises ``ImportError`` at
    first use if the ``pika`` client is not installed on executors."""

    def factory() -> Publisher:
        try:
            import pika  # deferred: executor-side dependency
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "amqp_publisher_factory needs the 'pika' package on the "
                "executors (pip install pika); for tests inject "
                "collecting_publisher_factory instead"
            ) from e

        def publish(payloads: list[bytes]) -> None:
            conn = pika.BlockingConnection(pika.URLParameters(url))
            try:
                ch = conn.channel()
                ch.exchange_declare(
                    exchange=exchange, exchange_type="direct", durable=True
                )
                props = pika.BasicProperties(
                    content_type="application/json", delivery_mode=2
                )
                for payload in payloads:
                    ch.basic_publish(
                        exchange=exchange,
                        routing_key=routing_key,
                        body=payload,
                        properties=props,
                    )
            finally:
                conn.close()

        return publish

    return factory


def kafka_sink(
    wire_df: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
):
    """Shape a streaming wire DataFrame (one ``payload`` string column,
    see :func:`streamclient_spark.streaming.sinks.to_wire`) into the
    built-in Kafka sink — the JVM-side, broker-batched production path.
    Returns the unstarted ``DataStreamWriter`` (caller ``.start()``s);
    Spark validates the kafka package when the query starts."""
    return (
        wire_df.select(F.col("payload").cast("string").alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
