"""Table sources: testdata parquet readers + distributed transcript synthesis."""
