"""Normalize LibriSpeech/LibriTTS into the speakers layout with per-utterance
transcripts (ref adapters: scripts/librispeech*.py).

LibriSpeech stores chapter transcripts in ``<spk>-<chap>.trans.txt``; LibriTTS
already has per-utterance ``.normalized.txt``/``.original.txt``. This splits
LibriSpeech chapter transcripts into per-utterance .txt files next to the
audio, in place.
"""
import argparse
from pathlib import Path

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("split_root", type=Path,
                        help="e.g. LibriSpeech/train-clean-100")
    args = parser.parse_args()

    n = 0
    for trans in sorted(args.split_root.glob("*/*/*.trans.txt")):
        for line in trans.read_text().splitlines():
            utt_id, _, text = line.partition(" ")
            if not text:
                continue
            out = trans.parent / f"{utt_id}.txt"
            if not out.exists():
                out.write_text(text.strip())
                n += 1
    print("Wrote %d per-utterance transcripts under %s" % (n, args.split_root))
