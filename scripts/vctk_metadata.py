"""VCTK: write per-speaker ``metadata.json`` (gender/age-group/accent/region
from speaker-info.txt) into encoder-preprocessed speaker dirs (ref adapter:
scripts/vctk_metadata.py, which uses pandas delim_whitespace — that split
truncates multi-word regions like "Southern England"; here the line is
split with maxsplit so the full region survives).

speaker-info.txt columns: ID AGE GENDER ACCENTS REGION...
Speaker dirs end with ``_p<ID>`` (e.g. ``VCTK-Corpus_wav48_p225``).
"""
import argparse
import json
from pathlib import Path

from _metadata import age_bucket

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Write VCTK speaker metadata.json files.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("speaker_info", type=Path,
                        help="Path to VCTK speaker-info.txt")
    parser.add_argument("encoder_dir", type=Path,
                        help="Encoder output dir containing VCTK speaker dirs")
    parser.add_argument("--glob", type=str, default="VCTK-Corpus*")
    args = parser.parse_args()

    speaker_hash = {}
    lines = args.speaker_info.read_text(encoding="utf-8",
                                        errors="ignore").splitlines()
    for line in lines[1:]:  # skip header
        parts = line.split(None, 4)
        if len(parts) < 4:
            continue
        sid, age, gender, accent = parts[:4]
        region = parts[4].strip() if len(parts) > 4 else "unknown"
        speaker_hash[sid.lstrip("pP")] = {
            "gender": "male" if gender.lower() == "m" else "female",
            "age": age_bucket(age),
            "age_year": int(age) if age.isdigit() else "unknown",
            "accent": accent,
            "region": region,
        }

    n = 0
    for speaker_dir in sorted(
        d for d in args.encoder_dir.glob(args.glob) if d.is_dir()
    ):
        metadata = {
            "gender": "unknown",
            "age": "unknown",
            "age_year": "unknown",
            "accent": "unknown",
            "region": "unknown",
            "language": "en",
            "utterances": {},
        }
        speaker_id = speaker_dir.name.split("_")[-1].lstrip("pP")
        if speaker_id in speaker_hash:
            metadata.update(speaker_hash[speaker_id])
        with (speaker_dir / "metadata.json").open("w", encoding="utf8") as out:
            json.dump(metadata, out, indent=4)
        n += 1
    print(f"Wrote metadata for {n} speakers.")
