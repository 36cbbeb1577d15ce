"""Structured Streaming topology (capability parity with the
reference's Faust app)."""
