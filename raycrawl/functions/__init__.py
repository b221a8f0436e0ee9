"""Scalar/vectorized functions: URL canonicalization, hashing, text stats."""
