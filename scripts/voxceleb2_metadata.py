"""VoxCeleb2: write per-speaker ``metadata.json`` (gender from vox2_meta.csv)
into encoder-preprocessed speaker dirs (ref adapter:
scripts/voxceleb2_metadata.py; hardcoded paths are CLI args here).

vox2_meta.csv is comma-separated:
VoxCeleb2 ID , VGGFace2 ID , Gender , Set
"""
import argparse
import csv
import json
from pathlib import Path

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Write VoxCeleb2 speaker metadata.json files.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("meta_csv", type=Path, help="Path to vox2_meta.csv")
    parser.add_argument("encoder_dir", type=Path,
                        help="Encoder output dir containing the speaker dirs")
    parser.add_argument("--glob", type=str, default="voxceleb_VoxCeleb2_*",
                        help="Speaker dir pattern (id is the last _ field)")
    args = parser.parse_args()

    speaker_hash = {}
    with args.meta_csv.open(newline="", encoding="utf-8") as f:
        reader = csv.reader(f, delimiter=",")
        next(reader, None)  # header
        for row in reader:
            if len(row) < 3:
                continue
            speaker_hash[row[0].strip()] = {
                "gender": "male" if row[2].strip().lower() == "m" else "female",
            }

    n = 0
    for speaker_dir in sorted(
        d for d in args.encoder_dir.glob(args.glob) if d.is_dir()
    ):
        metadata = {
            "gender": "unknown",
            "age": "unknown",
            "accent": "unknown",
            "language": "en",
            "utterances": {},
        }
        speaker_id = speaker_dir.name.split("_")[-1]
        if speaker_id in speaker_hash:
            metadata["gender"] = speaker_hash[speaker_id]["gender"]
        with (speaker_dir / "metadata.json").open("w", encoding="utf8") as out:
            json.dump(metadata, out, indent=4)
        n += 1
    print(f"Wrote metadata for {n} speakers.")
