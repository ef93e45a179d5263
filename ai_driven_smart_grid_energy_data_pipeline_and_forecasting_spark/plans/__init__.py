"""Logical query plans: the bronze→silver→gold medallion pipeline and
the serving-layer queries."""
