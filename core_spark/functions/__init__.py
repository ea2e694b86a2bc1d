"""Scalar/vector function surface: audio decode (Arrow pandas UDFs), text analysis."""
