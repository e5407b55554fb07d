"""End-to-end pipelines: relational oracle-checked queries + the flagship KG pipeline."""
