"""Structured Streaming: incremental ingest of web pages into the pipeline."""
