"""Batch sources/readers (SURVEY.md §2.1 S1-S6) and writers (K3/K4)."""
