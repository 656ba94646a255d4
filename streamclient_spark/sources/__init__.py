"""Data sources: custom Python streaming/batch sources (SURVEY.md §2A A1)."""

from streamclient_spark.sources.replay import EVENT_SCHEMA, EventReplayDataSource

__all__ = ["EVENT_SCHEMA", "EventReplayDataSource"]
