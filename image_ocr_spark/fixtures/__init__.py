"""Deterministic synthetic fixture generation (seeded; no external data)."""
