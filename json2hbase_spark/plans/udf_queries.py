"""K-ops: UDF/UDAF/UDTF surface (SURVEY.md §2) — filled in slice 4."""
