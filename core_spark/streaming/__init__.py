"""Streaming layer: read-committed view as a stateful streaming
operator, the exactly-once sink protocol, and the publisher."""
