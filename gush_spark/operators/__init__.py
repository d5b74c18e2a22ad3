"""Relational + streaming operators (SURVEY.md §2 inventory)."""
