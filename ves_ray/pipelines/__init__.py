"""Composed end-to-end dataflows."""
