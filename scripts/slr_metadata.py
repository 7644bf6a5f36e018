"""OpenSLR multi-language corpora: write per-speaker ``metadata.json``
(language from the SLR number, gender from the dir name) into
encoder-preprocessed speaker dirs (ref adapter: scripts/slr_metadata.py;
hardcoded paths are CLI args here).

Speaker dirs look like ``slr41_..._female_...``; the two digits after
``slr`` select the language.
"""
import argparse
import json
from pathlib import Path

# SLR corpora with gender encoded in the filename (ref slr_metadata.py:16-43)
LANGUAGE_MAPPING = {
    "41": "jv", "42": "km", "43": "ne", "44": "su", "61": "es",
    "63": "ml", "64": "mr", "65": "ta", "66": "te", "69": "ca",
    "70": "en-NG", "71": "es-CL", "72": "es-CO", "73": "es-PE",
    "74": "es-PR", "75": "es-VE", "76": "eu-ES", "77": "gl-ES",
    "78": "gu", "79": "kn", "80": "my",
}

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Write OpenSLR speaker metadata.json files.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("encoder_dir", type=Path,
                        help="Encoder output dir containing slr* speaker dirs")
    args = parser.parse_args()

    speaker_dirs = sorted(
        d for d in args.encoder_dir.glob("slr*") if d.is_dir()
    )
    print(f"dirs: {len(speaker_dirs)}")

    n = 0
    for speaker_dir in speaker_dirs:
        slr_id = speaker_dir.name[3:5]
        if slr_id not in LANGUAGE_MAPPING:
            continue
        metadata = {
            "gender": "unknown",
            "age": "unknown",
            "accent": "unknown",
            "language": LANGUAGE_MAPPING[slr_id],
            "utterances": {},
        }
        if "_female_" in speaker_dir.name:
            metadata["gender"] = "female"
        elif "_male_" in speaker_dir.name:
            metadata["gender"] = "male"
        with (speaker_dir / "metadata.json").open("w", encoding="utf8") as out:
            json.dump(metadata, out, indent=4)
        n += 1
    print(f"Wrote metadata for {n} speakers.")
