"""Sinks: console/kafka/parquet writers + the generic buffered bulk sink
(SURVEY.md §2.5 K1-K9)."""
