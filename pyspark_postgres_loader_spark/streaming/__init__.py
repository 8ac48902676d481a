"""Structured Streaming operators (see windows.py)."""
