"""Spark operators: tokenize, block selection, generation, dedup, similarity,
span joins, checkpoint manifests."""
