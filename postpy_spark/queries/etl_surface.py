"""Placeholder — filled in as coverage widens (SURVEY.md §7)."""
