"""Pipelines: flagship extraction, ordering, metrics, serial oracle."""
