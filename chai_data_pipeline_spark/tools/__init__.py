"""Operational tooling around the query registry (plan linting)."""
