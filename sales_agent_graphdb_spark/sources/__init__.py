"""Source/sink connectors (SURVEY.md §2.1, S1–S4 + S9) and the
multimodal binary-column surface."""
