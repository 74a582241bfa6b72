"""Core state, box, RNG and integration primitives (SURVEY.md §2a rows 3,4,8)."""
