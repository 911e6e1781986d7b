"""Scalar-function helpers shared by operators and declared queries."""
