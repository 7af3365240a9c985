"""Structured Streaming layer: windows/watermarks + stateful count/hybrid
triggers (SURVEY.md §2.4)."""
