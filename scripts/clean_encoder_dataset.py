"""Prune under-represented speakers from a preprocessed SV2TTS/encoder dir.

GE2E needs several utterances per speaker; speakers whose ``combined.npz``
holds fewer than --min partial-mel entries are removed (ref:
scripts/clean_encoders_npz.py — hardcoded paths/thresholds there; argparse
here).
"""
import argparse
from pathlib import Path
from shutil import rmtree

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Remove speakers with too few utterances from a "
                    "preprocessed encoder dataset.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("encoder_root", type=Path,
                        help="SV2TTS/encoder directory.")
    parser.add_argument("--min", type=int, default=5,
                        help="Minimum utterances per speaker.")
    parser.add_argument("--dry_run", action="store_true",
                        help="Only report; do not delete.")
    args = parser.parse_args()

    removed = kept = 0
    for speaker_dir in sorted(d for d in args.encoder_root.glob("*") if d.is_dir()):
        npz = speaker_dir / "combined.npz"
        if npz.exists():
            with np.load(npz) as data:
                n = len(data.files)
        else:
            n = len(list(speaker_dir.glob("*.npy")))
        if n < args.min:
            print("Removing %s (%d utterances)" % (speaker_dir.name, n))
            removed += 1
            if not args.dry_run:
                rmtree(speaker_dir)
        else:
            kept += 1
    print("Kept %d speakers, removed %d." % (kept, removed))
