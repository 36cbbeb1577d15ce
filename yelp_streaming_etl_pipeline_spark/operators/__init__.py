"""Composite DataFrame operators (gauntlet, stats, dedup, similarity,
relational library, multimodal plumbing)."""
