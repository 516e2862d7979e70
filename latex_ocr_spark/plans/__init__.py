"""Query registry: named queries + their DuckDB oracle SQL."""
