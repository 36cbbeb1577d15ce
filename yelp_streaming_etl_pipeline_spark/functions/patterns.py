"""Shared regex patterns for spam detection and language ID.

The reference's spam patterns (/root/reference/streaming/models.py:175-181)
cover: promotional words, URLs, phone numbers, emails, and 5+ repeated
characters. We re-declare semantically equivalent patterns here with one
deliberate constraint: every pattern must be valid in BOTH Java regex
(Spark) and RE2 (DuckDB oracle), so the repeated-character pattern is an
explicit alternation instead of a backreference (``(.)\\1{4,}`` is not
RE2-expressible). Divergence documented: the alternation covers
[a-z0-9] plus common punctuation rather than *any* character.

These constants are imported by both the Spark expression library and
the oracle-SQL generator in __spark_entry__.py so the two sides always
evaluate the exact same pattern.
"""

from __future__ import annotations


def _repeat_run_pattern(min_run: int) -> str:
    chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    parts = [f"{c}{{{min_run},}}" for c in chars]
    for c, esc in [("!", "!"), ("?", r"\?"), (".", r"\."), (",", ","), ("-", "-")]:
        parts.append(f"{esc}{{{min_run},}}")
    return "(?:" + "|".join(parts) + ")"


# Matched against LOWERCASED text (the reference lowercases before
# matching, quality_engine.py:117)
SPAM_PROMO = r"(free|discount|promo|deal|offer|click here|buy now|limited time)"
SPAM_URL = r"(https?://[^\s]+|www\.[^\s]+)"
SPAM_PHONE = r"[0-9]{3}[-. ]?[0-9]{3}[-. ]?[0-9]{4}"
SPAM_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
SPAM_REPEAT5 = _repeat_run_pattern(5)  # 5+ repeated chars (one pattern hit)

SPAM_PATTERNS = [SPAM_PROMO, SPAM_URL, SPAM_PHONE, SPAM_EMAIL, SPAM_REPEAT5]

# Quality-score penalty inputs (quality_engine.py:113-147)
REPEAT4_RUN = _repeat_run_pattern(4)  # runs of 4+ repeated chars
SPAM_PUNCT_CLASS = r"[!?.,;:]"  # spam-score punct set (narrower than T6's)

# Language-ID marker words (n-gram/stopword heuristic — public-knowledge
# high-frequency function words per language). Word-boundary anchored;
# matched against lowercased text. \b works in both Java regex and RE2.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|is|of|to|in|that|it|for|was|with|this)\b",
    "es": r"\b(el|la|los|las|de|que|y|en|un|una|es|no|por|con)\b",
    "fr": r"\b(le|la|les|de|et|un|une|est|que|pour|dans|ce|avec)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|zu|mit|von|den)\b",
}
LANG_ZH_CLASS = r"[\x{4e00}-\x{9fff}]"  # CJK presence (RE2 syntax)
LANG_ZH_CLASS_JAVA = r"[一-鿿]"  # same class, Java syntax
