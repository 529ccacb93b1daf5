"""Scalar functions, derived columns, and north-star pipeline ops."""
