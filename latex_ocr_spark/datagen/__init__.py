"""Deterministic synthetic-data generation (seed-stable, no RNG state
shared across rows: every value derives from (conv_id, turn_idx))."""
