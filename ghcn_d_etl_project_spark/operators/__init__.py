"""Operator families (SURVEY.md §2) as composable, scale-safe functions."""
