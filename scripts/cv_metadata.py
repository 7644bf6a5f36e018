"""CommonVoice: write per-speaker ``metadata.json`` (majority-vote age/
gender/accent + utterance sentences/votes) into encoder-preprocessed speaker
dirs (ref adapter: scripts/cv_metadata.py; the hardcoded /datasets and
/output paths are CLI arguments here).

Encoder speaker dirs are expected to be named
``<prefix><client_id[:20]>`` and contain ``<clip>.npy`` per utterance.
"""
import argparse
import json
from collections import Counter
from pathlib import Path


def majority(values):
    filled = [v for v in values if v]
    if not filled:
        return "unknown"
    return Counter(filled).most_common(1)[0][0]


if __name__ == "__main__":
    import csv

    parser = argparse.ArgumentParser(
        description="Write CommonVoice speaker metadata.json files.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("lang_dir", type=Path,
                        help="CommonVoice language dir (contains validated.tsv)")
    parser.add_argument("encoder_dir", type=Path,
                        help="Encoder output dir containing the speaker dirs")
    parser.add_argument("--lang", type=str, required=True)
    parser.add_argument("--prefix", type=str, default=None,
                        help="Speaker dir name prefix "
                             "(default: CommonVoice_<lang>_speakers_)")
    args = parser.parse_args()

    prefix = args.prefix or f"CommonVoice_{args.lang}_speakers_"

    speakers = {}
    with (args.lang_dir / "validated.tsv").open(newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            speakers.setdefault(row["client_id"][:20], []).append(row)
    print(f"  - Found {len(speakers)} speakers...")

    n = 0
    for client_id, rows in speakers.items():
        speaker_dir = args.encoder_dir / f"{prefix}{client_id}"
        if not speaker_dir.exists():
            continue
        metadata = {
            "age": majority(r.get("age") for r in rows),
            "gender": majority(r.get("gender") for r in rows),
            "language": args.lang,
            "accent": majority(
                r.get("accent") or r.get("accents") for r in rows
            ),
            "utterances": {},
        }
        for r in rows:
            stem = Path(r["path"]).stem
            if not (speaker_dir / f"{stem}.npy").exists():
                continue
            metadata["utterances"][stem] = {
                "path": stem,
                "sentence": r["sentence"],
                "up_votes": int(r.get("up_votes") or 0),
                "down_votes": int(r.get("down_votes") or 0),
            }
        with (speaker_dir / "metadata.json").open("w", encoding="utf8") as out:
            json.dump(metadata, out, indent=4)
        n += 1
    print(f"Wrote metadata for {n} speakers.")
