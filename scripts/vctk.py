"""Normalize VCTK-Corpus into the speakers/transcripts layout
(ref adapter: scripts/vctk.py).

VCTK ships ``wav48_silence_trimmed/<spk>/<spk>_<utt>_mic{1,2}.flac`` and
``txt/<spk>/<spk>_<utt>.txt``. This links/copies one mic per utterance into
``<out>/speakers/<spk>/`` with matching ``.txt`` transcripts next to the
audio — the layout every preprocessing entry point consumes.
"""
import argparse
import shutil
from pathlib import Path

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("vctk_root", type=Path, help="VCTK-Corpus directory")
    parser.add_argument("-o", "--out", type=Path, default=None)
    parser.add_argument("--mic", type=str, default="mic1", choices=["mic1", "mic2"])
    parser.add_argument("--copy", action="store_true",
                        help="Copy files instead of hard-linking.")
    args = parser.parse_args()

    out = args.out or args.vctk_root / "speakers"
    audio_root = args.vctk_root / "wav48_silence_trimmed"
    txt_root = args.vctk_root / "txt"
    assert audio_root.exists(), audio_root

    n = 0
    for spk_dir in sorted(audio_root.glob("p*")):
        out_spk = out / spk_dir.name
        out_spk.mkdir(parents=True, exist_ok=True)
        for audio in sorted(spk_dir.glob(f"*_{args.mic}.flac")):
            utt = audio.stem.rsplit("_", 1)[0]  # p225_001
            txt = txt_root / spk_dir.name / f"{utt}.txt"
            if not txt.exists():
                continue
            dst_audio = out_spk / f"{utt}{audio.suffix}"
            dst_txt = out_spk / f"{utt}.txt"
            if not dst_audio.exists():
                if args.copy:
                    shutil.copyfile(audio, dst_audio)
                else:
                    try:
                        dst_audio.hardlink_to(audio)
                    except OSError:
                        shutil.copyfile(audio, dst_audio)
            if not dst_txt.exists():
                shutil.copyfile(txt, dst_txt)
            n += 1
    print("Linked %d utterances into %s" % (n, out))
