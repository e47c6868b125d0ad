"""Utilities: checkpoint interchange, schedulers, EMA, training helpers."""
