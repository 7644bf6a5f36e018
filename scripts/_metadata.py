"""Shared helpers for the per-corpus metadata.json adapters (the reference
duplicates the age-bucket ladder in scripts/slr68_metadata.py:55-80 and
scripts/vctk_metadata.py:33-57; it lives once here)."""
from __future__ import annotations

_BUCKETS = [
    (100, "centenarian"), (90, "nineties"), (80, "eighties"),
    (70, "seventies"), (60, "sixties"), (50, "fifties"), (40, "fourties"),
    (30, "thirties"), (20, "twenties"), (13, "teens"),
]


def age_bucket(years) -> str:
    """Integer age → the CommonVoice-style age-group label used across all
    metadata.json files ('fourties' [sic] matches the reference/corpus
    spelling)."""
    try:
        years = int(years)
    except (TypeError, ValueError):
        return "unknown"
    for lo, label in _BUCKETS:
        if years >= lo:
            return label
    return "child" if 0 <= years < 13 else "unknown"
