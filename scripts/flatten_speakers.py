"""Generic corpus adapter: flatten any nested audio corpus into the
speakers/transcripts layout (covers the long tail of the reference's 30
per-corpus scripts — CN-Celeb, nasjonalbank, the OpenSLR packs, … — which all
reduce to 'pick a directory level as the speaker id and link files under
it')."""
import argparse
import shutil
from pathlib import Path

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("root", type=Path, help="Corpus root")
    parser.add_argument("-o", "--out", type=Path, default=None)
    parser.add_argument("--speaker_depth", type=int, default=1,
                        help="Directory depth (from root) that identifies the "
                             "speaker.")
    parser.add_argument("--ext", type=str, default=".wav",
                        help="Audio extension to collect.")
    parser.add_argument("--transcript_ext", type=str, default=None,
                        help="If set, copy sibling transcripts too.")
    parser.add_argument("--copy", action="store_true")
    args = parser.parse_args()

    out = args.out or args.root / "speakers"
    n = 0
    for audio in sorted(args.root.glob(f"**/*{args.ext}")):
        rel = audio.relative_to(args.root)
        if len(rel.parts) <= args.speaker_depth:
            continue
        speaker = "_".join(rel.parts[: args.speaker_depth])
        spk_dir = out / speaker
        spk_dir.mkdir(parents=True, exist_ok=True)
        stem = "_".join(rel.parts[args.speaker_depth :]).replace(args.ext, "")
        dst = spk_dir / f"{stem}{args.ext}"
        if not dst.exists():
            if args.copy:
                shutil.copyfile(audio, dst)
            else:
                try:
                    dst.hardlink_to(audio)
                except OSError:
                    shutil.copyfile(audio, dst)
        if args.transcript_ext:
            src_txt = audio.with_suffix(args.transcript_ext)
            if src_txt.exists():
                shutil.copyfile(src_txt, dst.with_suffix(".txt"))
        n += 1
    print("Linked %d files into %s" % (n, out))
