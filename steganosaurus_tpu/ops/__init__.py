"""Vectorized device ops (JAX) for the embed/extract compute path."""
