"""Structured-Streaming layer: rate-controlled source, CEP state, exactly-once sink, metrics."""
