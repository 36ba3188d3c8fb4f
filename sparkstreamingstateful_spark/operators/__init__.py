"""Batch relational operators (SURVEY.md §2.2–§2.8, §2.10–§2.11)."""
