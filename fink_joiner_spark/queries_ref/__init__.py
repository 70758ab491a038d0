"""Registered query modules (reference-parity core + scale extensions)."""
