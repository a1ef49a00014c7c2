"""Reusable column-level function kits (pure Spark expressions first)."""
