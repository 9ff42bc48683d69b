"""ML / model-pipeline operators (SURVEY.md §2.9)."""
