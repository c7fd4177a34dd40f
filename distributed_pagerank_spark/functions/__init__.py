"""Scalar/column function library: text analysis, hashing, vectors."""
