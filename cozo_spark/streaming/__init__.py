"""Streaming extension: mutation change-feed as a Structured Streaming
source, plus the reference's callback surface."""

from cozo_spark.streaming.changefeed import ChangeFeed  # noqa: F401
