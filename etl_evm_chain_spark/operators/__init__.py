"""Relational/stateful operators built on the function kits."""
