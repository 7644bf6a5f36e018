"""CommonVoice: write per-utterance ``.txt`` transcripts next to already-
converted wavs in the speakers layout (ref adapter:
scripts/cv_speaker_transcript.py).

Expects <lang_dir>/speakers/<client_id[:20]>/<clip>.wav produced by an audio
conversion pass; adds <clip>.txt with the validated sentence.
"""
import argparse
import csv
from pathlib import Path

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Add transcripts to a converted CommonVoice speakers tree.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("lang_dir", type=Path,
                        help="CommonVoice language dir (validated.tsv, speakers/)")
    parser.add_argument("--id_prefix", type=int, default=20,
                        help="Speaker dirs are named client_id[:N] (ref uses 20)")
    args = parser.parse_args()

    speakers = {}
    with (args.lang_dir / "validated.tsv").open(newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            speakers.setdefault(row["client_id"][: args.id_prefix], []).append(row)
    print(f"  - Found {len(speakers)} speakers...")

    n = 0
    for client_id in sorted(speakers):
        for row in speakers[client_id]:
            wav = (args.lang_dir / "speakers" / client_id /
                   Path(row["path"]).stem).with_suffix(".wav")
            if not wav.exists():
                continue
            txt = wav.with_suffix(".txt")
            if not txt.exists():
                txt.write_text(row["sentence"], encoding="utf8")
                n += 1
    print(f"Wrote {n} transcripts.")
