"""Structured Streaming layer: the streaming twins of the batch event
analytics, plus streaming dedup and the foreachBatch upsert sink."""
