"""Pallas TPU kernels for the hot path (SURVEY.md §2b rows 20-23, §7.1 phase 4)."""
