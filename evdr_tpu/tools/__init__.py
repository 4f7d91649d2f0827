"""Offline tooling: dataset splitting, dedup, pseudo-query generation, reporting."""
