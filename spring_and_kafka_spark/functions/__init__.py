"""Scalar / semi-structured function surface (SURVEY.md §2.7)."""
