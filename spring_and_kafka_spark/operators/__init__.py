"""Relational operators: projections/filters, aggregations, joins, windows, set ops, UDF surface."""
