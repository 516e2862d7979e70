"""Column expressions and vectorized UDFs."""
