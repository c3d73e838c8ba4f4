"""Plan-level rewrites and pipeline composition (engine layer above
DataFrames — the pieces Catalyst doesn't know about; SURVEY.md §4)."""
