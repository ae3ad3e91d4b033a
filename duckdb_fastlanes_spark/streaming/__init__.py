"""Structured Streaming extension operators (beyond-reference; SURVEY §2.C
notes the reference has no streaming surface at all)."""
