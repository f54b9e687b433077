"""Scalar/column function library: text stats, similarity, dedup, embeddings."""
