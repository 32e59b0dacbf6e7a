"""Utilities: tracing/profiling and logging setup."""
