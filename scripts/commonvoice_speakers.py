"""Normalize a CommonVoice corpus into the speakers layout
(ref adapter: scripts/commonvoice_speakers.py).

Reads ``validated.tsv`` (client_id, path, sentence), groups clips by speaker
hash and emits ``<out>/speakers/<client_id[:16]>/<clip>.{ext,txt}``.
Clips are linked/copied as-is; for in-process mp3→flac conversion use
``scripts/commonvoice_transcript.py`` (native FFmpeg shim) or
``scripts/convert_audio.py``.
"""
import argparse
import csv
import shutil
from pathlib import Path

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("cv_root", type=Path,
                        help="CommonVoice language dir (contains validated.tsv, clips/)")
    parser.add_argument("-o", "--out", type=Path, default=None)
    parser.add_argument("--min_clips", type=int, default=3,
                        help="Skip speakers with fewer clips.")
    args = parser.parse_args()

    out = args.out or args.cv_root / "speakers"
    tsv = args.cv_root / "validated.tsv"
    clips = args.cv_root / "clips"
    assert tsv.exists(), tsv

    by_speaker = {}
    with tsv.open(newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            by_speaker.setdefault(row["client_id"], []).append(
                (row["path"], row["sentence"])
            )

    n_spk = n_utt = 0
    for client_id, entries in by_speaker.items():
        if len(entries) < args.min_clips:
            continue
        spk_dir = out / client_id[:16]
        spk_dir.mkdir(parents=True, exist_ok=True)
        for path, sentence in entries:
            src = clips / Path(path).with_suffix(".wav").name
            if not src.exists():
                continue
            dst = spk_dir / src.name
            if not dst.exists():
                try:
                    dst.hardlink_to(src)
                except OSError:
                    shutil.copyfile(src, dst)
            dst.with_suffix(".txt").write_text(sentence)
            n_utt += 1
        n_spk += 1
    print("Wrote %d utterances for %d speakers into %s" % (n_utt, n_spk, out))
