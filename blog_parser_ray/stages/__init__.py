"""Pipeline stages: parse (P1/P2/P7), enrich (ST1), route (ST2), sink (ST3/S4),
aggregates (A1–A7, O1–O3). See SURVEY.md §2 for the operator inventory."""
