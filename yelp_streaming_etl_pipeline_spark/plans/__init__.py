"""Plan inspection & audit helpers."""
