"""Structured Streaming surface: streaming document ingest -> extraction,
watermarked event-time windows, custom stateful sessionization."""
