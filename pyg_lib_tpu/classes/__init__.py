"""Placeholder — populated in later build phases (SURVEY.md §7)."""
