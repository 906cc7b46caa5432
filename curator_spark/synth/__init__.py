"""Deterministic synthetic data generation (seed=42, no external data)."""
