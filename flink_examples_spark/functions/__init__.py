"""Scalar/column expression helpers (text, vectors, codecs)."""
