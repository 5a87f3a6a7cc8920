"""Operator library. Each module registers queries via registry.query."""
