"""Custom operators Spark lacks natively, built as compositions of
DataFrame ops (SURVEY.md §4.1 — no Catalyst extensions needed)."""
