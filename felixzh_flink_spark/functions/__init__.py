"""Format codecs, changelog/CDC decoders, payload generators, UDF registry
(SURVEY.md §2.6, F3-F8, U1-U3)."""
