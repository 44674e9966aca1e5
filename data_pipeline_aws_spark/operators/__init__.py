"""Relational + extension operators, one module per SURVEY §2 family."""
