"""Deterministic synthetic corpus generation (seeded, no external data)."""
