"""SLR68 (MAGICDATA Mandarin): write per-speaker ``metadata.json`` (gender/
age-group/dialect from SPKINFO.txt) into encoder-preprocessed speaker dirs
(ref adapter: scripts/slr68_metadata.py; hardcoded paths are CLI args here).

SPKINFO.txt is tab-separated: SPKID \t Age \t Gender \t Dialect.
Speaker dirs end with the two-part SPKID (e.g. ``slr68_..._14_3466``).
"""
import argparse
import csv
import json
from pathlib import Path

from _metadata import age_bucket

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Write SLR68 speaker metadata.json files.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("spkinfo", type=Path, help="Path to SPKINFO.txt")
    parser.add_argument("encoder_dir", type=Path,
                        help="Encoder output dir containing slr68_* speaker dirs")
    args = parser.parse_args()

    speaker_hash = {}
    with args.spkinfo.open(newline="", encoding="utf-8") as f:
        reader = csv.reader(f, delimiter="\t")
        next(reader, None)  # header
        for row in reader:
            if len(row) < 4:
                continue
            speaker_hash[row[0]] = {
                "gender": row[2].lower(),
                "nationality": row[3],
                "age": age_bucket(row[1]),
            }

    n = 0
    for speaker_dir in sorted(
        d for d in args.encoder_dir.glob("slr68_*") if d.is_dir()
    ):
        metadata = {
            "gender": "unknown",
            "age": "unknown",
            "accent": "unknown",
            "language": "zh",
            "utterances": {},
        }
        speaker_id = "_".join(speaker_dir.name.split("_")[-2:])
        if speaker_id in speaker_hash:
            metadata.update(speaker_hash[speaker_id])
        with (speaker_dir / "metadata.json").open("w", encoding="utf8") as out:
            json.dump(metadata, out, indent=4)
        n += 1
    print(f"Wrote metadata for {n} speakers.")
