"""Checkpoint / resume state (per-partition lineage manifests)."""
