"""Scalar function families (SURVEY §2.7) and text analysis (§2.8)."""
