"""Force operators: pair (DPD/eDPD/tDPD), bonded, walls (SURVEY.md §2 rows 15,20-26)."""
