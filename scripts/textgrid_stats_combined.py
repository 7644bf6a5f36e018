"""Aggregate word/phone duration statistics ACROSS several MFA-aligned
datasets into one combined ``stats.json`` (ref adapter:
scripts/textgrid_stats_combined.py; the DATASETS constant is a CLI list)."""
import argparse
import json
from pathlib import Path

from textgrid_stats import collect, duration_stats

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Combined word/phone stats across datasets.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("aligned_root", type=Path,
                        help="Dir containing one subdir per aligned dataset")
    parser.add_argument("datasets", nargs="+",
                        help="Dataset subdir names (e.g. cv-en dev-clean)")
    parser.add_argument("-o", "--out", type=Path, default=None)
    args = parser.parse_args()

    words: dict = {}
    phones: dict = {}
    total = 0
    for name in args.datasets:
        n = collect(args.aligned_root / name, words, phones)
        print(f"{name}: {n} TextGrids")
        total += n
    duration_stats(words)
    duration_stats(phones)

    out = args.out or args.aligned_root / "stats_combined.json"
    with out.open("w", encoding="utf8") as f:
        json.dump({"words": words, "phones": phones}, f, indent=4)
    print(f"Aggregated {total} TextGrids across {len(args.datasets)} "
          f"datasets -> {out}")
