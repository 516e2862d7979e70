"""DataFrame-level operators of the engine."""
