"""Reusable column expressions and vectorized key functions."""
