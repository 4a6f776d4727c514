"""Structured Streaming layer: sources, watermarks, stateful ops, sinks."""
