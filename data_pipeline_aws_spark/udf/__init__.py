"""UDF surface (SURVEY §2.10): vectorized Pandas UDFs only — row-at-a-time
Python UDFs are deliberately absent (the slow path has no place in the
engine; anything scalar should be a builtin expression)."""
