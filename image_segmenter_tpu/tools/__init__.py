"""Operational command-line tools (checkpoint verification, diagnostics)."""
