"""Operator library: SURVEY.md §2 inventory as composable DataFrame ops."""
