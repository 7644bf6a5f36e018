"""VoxCeleb1: write per-speaker ``metadata.json`` (gender/name/nationality
from vox1_meta.csv) into encoder-preprocessed speaker dirs (ref adapter:
scripts/voxceleb1_metadata.py; hardcoded paths are CLI args here).

vox1_meta.csv is tab-separated:
VoxCeleb1 ID \t VGGFace1 ID \t Gender \t Nationality \t Set
"""
import argparse
import csv
import json
from pathlib import Path

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Write VoxCeleb1 speaker metadata.json files.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("meta_csv", type=Path, help="Path to vox1_meta.csv")
    parser.add_argument("encoder_dir", type=Path,
                        help="Encoder output dir containing the speaker dirs")
    parser.add_argument("--glob", type=str, default="voxceleb_VoxCeleb1_*",
                        help="Speaker dir pattern (id is the last _ field)")
    args = parser.parse_args()

    speaker_hash = {}
    with args.meta_csv.open(newline="", encoding="utf-8") as f:
        reader = csv.reader(f, delimiter="\t")
        next(reader, None)  # header
        for row in reader:
            speaker_hash[row[0].strip()] = {
                "gender": "male" if row[2].strip().lower() == "m" else "female",
                "name": row[1].strip(),
                "nationality": row[3].strip(),
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
            metadata.update(speaker_hash[speaker_id])
        with (speaker_dir / "metadata.json").open("w", encoding="utf8") as out:
            json.dump(metadata, out, indent=4)
        n += 1
    print(f"Wrote metadata for {n} speakers.")
