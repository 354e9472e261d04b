"""Structured Streaming wrappers (events table)."""
