"""Structured Streaming ingest into IceMini tables."""
