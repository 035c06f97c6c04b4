"""Shared utilities: profiling, debug guards, logging."""
