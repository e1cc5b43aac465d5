"""Cross-cutting utilities: quality metrics and structured debug tracing."""
