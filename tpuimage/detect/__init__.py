"""Detection components: Haar cascades (face/eye), document quad
localization, heuristic scene cues (SURVEY.md §2.2 hard parts)."""
