"""C7 as-of join + I-ops streaming (SURVEY.md §2) — filled in slice 3."""
