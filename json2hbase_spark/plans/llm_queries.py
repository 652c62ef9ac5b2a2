"""J-ops: LLM-data-pipeline operators (SURVEY.md §2) — filled in slice 4."""
