"""Mesh / sharding layer: multi-chip MSM and pairing reduction."""
