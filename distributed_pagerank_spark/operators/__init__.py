"""Operators: degrees/symmetrize, skew salting, dedup, similarity, multimodal, corpus selection/packing."""
