"""Merge several synthesizer-preprocess output dirs into one.

The reference documents this as a manual shell recipe (ref:
scripts/synthesizer_merge.py — cat train.txt files + mv artifact dirs);
here it is a checked tool: concatenates the ``train.json`` speaker maps and
hard-links (or copies) every artifact file, refusing to silently clobber
utterance-id collisions.
"""
import argparse
import json
import os
import shutil
from pathlib import Path

ARTIFACT_DIRS = ("mels", "wav", "embeds", "duration", "attention",
                 "alignment", "phoneme_pitch", "phoneme_energy")

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Merge synthesizer preprocess outputs into one dataset.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("sources", type=Path, nargs="+",
                        help="Input synthesizer dirs (each with train.json).")
    parser.add_argument("-o", "--out_dir", type=Path, required=True)
    parser.add_argument("--copy", action="store_true",
                        help="Copy files instead of hard-linking.")
    args = parser.parse_args()

    merged = {}
    args.out_dir.mkdir(parents=True, exist_ok=True)
    for src in args.sources:
        meta = json.loads((src / "train.json").read_text())
        for speaker, lines in meta.items():
            if speaker in merged:
                existing = {ln.split("|")[0] for ln in merged[speaker]}
                dupes = [ln for ln in lines if ln.split("|")[0] in existing]
                assert not dupes, (
                    "utterance-id collision for speaker %s: %s"
                    % (speaker, dupes[:3])
                )
                merged[speaker].extend(lines)
            else:
                merged[speaker] = list(lines)
        for d in ARTIFACT_DIRS:
            sdir = src / d
            if not sdir.is_dir():
                continue
            (args.out_dir / d).mkdir(exist_ok=True)
            for f in sdir.iterdir():
                target = args.out_dir / d / f.name
                if target.exists():
                    continue
                if args.copy:
                    shutil.copyfile(f, target)
                else:
                    os.link(f, target)
        print("Merged %s" % src)

    (args.out_dir / "train.json").write_text(json.dumps(merged, indent=2))
    n = sum(len(v) for v in merged.values())
    print("Wrote %d utterances / %d speakers to %s"
          % (n, len(merged), args.out_dir / "train.json"))
