"""Checkpoint manifests, lineage records, and per-partition metrics."""
