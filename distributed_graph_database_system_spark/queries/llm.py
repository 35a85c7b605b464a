"""LLM-pipeline queries — populated in M3."""
