"""Scalar / text / vector function surface (SURVEY.md §2.8, §2.12)."""
