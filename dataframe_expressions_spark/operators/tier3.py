"""Tier 3 LLM-data + streaming operators — populated incrementally."""
