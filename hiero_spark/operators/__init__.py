"""Operators: hiero's sketch/map/filter surface re-expressed as DataFrame ops."""
