"""Utilities: phase timing, synthetic systems, checkpointing."""
