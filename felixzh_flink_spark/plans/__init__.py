"""Pipeline spec layer: properties-file-compatible job configs executed in
batch or streaming mode (SURVEY.md §2.8 U4/U8)."""
