"""Checkpoint state: the per-partition lineage manifest (S5)."""
