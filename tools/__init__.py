"""Standalone tooling (weight conversion, benchmarks, demos)."""
