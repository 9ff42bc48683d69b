"""Relational operator surface (SURVEY.md §2.2–§2.8) as composable
DataFrame builders, each with a DuckDB-oracle-checkable shape."""
