"""Relational + pipeline operators beyond plain DataFrame passthrough
(SURVEY §2.C custom joins, §2.G-2.H LLM-data-pipeline ops)."""
