"""Structured Streaming wrappers over the batch extraction path."""
