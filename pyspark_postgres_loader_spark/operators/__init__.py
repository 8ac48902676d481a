"""Operator modules. Importing them registers queries (see registry.py)."""
