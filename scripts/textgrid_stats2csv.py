"""Flatten a ``stats.json`` (from textgrid_stats.py) into a CSV for one data
type (words|phones) (ref adapter: scripts/textgrid_stats2csv.py; hardcoded
path + DATA_TYPE constant are CLI args here)."""
import argparse
import csv
import json
from pathlib import Path

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="stats.json -> CSV.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("stats_json", type=Path)
    parser.add_argument("--type", choices=("words", "phones"),
                        default="phones")
    parser.add_argument("-o", "--out", type=Path, default=None)
    args = parser.parse_args()

    out = args.out or args.stats_json.with_name(
        f"{args.stats_json.stem}_{args.type}.csv"
    )
    with args.stats_json.open(encoding="utf8") as f:
        data = json.load(f)[args.type]

    with out.open("w", encoding="utf8", newline="") as f:
        writer = csv.DictWriter(
            f,
            ["text", "count", "duration_min", "duration_max",
             "duration_avg", "duration_std"],
        )
        writer.writeheader()
        for item in data.values():
            writer.writerow({
                "text": item["text"],
                "count": item["count"],
                "duration_min": item["duration"]["min"],
                "duration_max": item["duration"]["max"],
                "duration_avg": item["duration"]["avg"],
                "duration_std": item["duration"]["std"],
            })
    print(f"Wrote {len(data)} rows -> {out}")
