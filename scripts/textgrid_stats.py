"""Aggregate word/phone duration statistics from MFA TextGrid alignments
into ``stats.json`` (ref adapter: scripts/textgrid_stats.py; the hardcoded
dataset path is a CLI arg and the ``tgt`` dependency is replaced by the
shared regex parser).

Walks <root>/<speaker>[/<book>]/*.TextGrid and emits
{"words": {...}, "phones": {...}} with per-token count + duration
min/max/avg/std.
"""
import argparse
import json
from pathlib import Path

import numpy as np

from _textgrid import parse_textgrid_tiers


def collect(base_path: Path, words: dict, phones: dict) -> int:
    grids = sorted(base_path.glob("**/*.TextGrid"))
    for grid in grids:
        tiers = parse_textgrid_tiers(
            grid.read_text(encoding="utf-8", errors="ignore")
        )
        for tier_name, dataset in (("words", words), ("phones", phones)):
            for xmin, xmax, text in tiers.get(tier_name, []):
                item = dataset.setdefault(
                    text, {"text": text, "count": 0, "duration": []}
                )
                item["count"] += 1
                item["duration"].append(xmax - xmin)
    return len(grids)


def duration_stats(dataset: dict) -> dict:
    """In-place reduce duration lists to min/max/avg/std (ref
    textgrid_stats.py:82-93)."""
    for item in dataset.values():
        vals = np.array(item["duration"])
        item["duration"] = {
            "min": float(vals.min()),
            "max": float(vals.max()),
            "avg": float(vals.mean()),
            "std": float(vals.std()),
        }
    return dataset


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Word/phone duration stats from MFA TextGrids.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("aligned_root", type=Path,
                        help="MFA output dir for one dataset")
    parser.add_argument("-o", "--out", type=Path, default=None,
                        help="Output JSON (default <root>/stats.json)")
    args = parser.parse_args()

    words: dict = {}
    phones: dict = {}
    n = collect(args.aligned_root, words, phones)
    duration_stats(words)
    duration_stats(phones)

    out = args.out or args.aligned_root / "stats.json"
    with out.open("w", encoding="utf8") as f:
        json.dump({"words": words, "phones": phones}, f, indent=4)
    print(f"Aggregated {n} TextGrids: {len(words)} words, "
          f"{len(phones)} phones -> {out}")
