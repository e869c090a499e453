"""End-to-end pipeline plans (the flagship extraction DAG)."""
