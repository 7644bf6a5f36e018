"""Preprocess audio + transcripts for synthesizer training
(ref: synthesizer_preprocess_audio.py)."""
import argparse
from pathlib import Path

from rtvc_tpu.config.datasets import synthesizer_datasets
from rtvc_tpu.data.synthesizer_preprocess import synthesizer_preprocess_dataset

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("datasets_root", type=Path)
    parser.add_argument("-o", "--out_dir", type=Path, default=None)
    parser.add_argument("-n", "--n_processes", type=int, default=4)
    parser.add_argument("-s", "--skip_existing", action="store_true")
    parser.add_argument(
        "-d", "--datasets", type=str, default="LibriTTS",
        help="Comma-separated corpus names (see synthesizer_datasets registry).",
    )
    args = parser.parse_args()

    out_dir = args.out_dir or args.datasets_root / "SV2TTS" / "synthesizer"
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in args.datasets.split(","):
        name = name.strip()
        if name not in synthesizer_datasets:
            print("Unknown dataset %r — known: %s"
                  % (name, sorted(synthesizer_datasets)))
            continue
        spec = synthesizer_datasets[name]
        synthesizer_preprocess_dataset(
            args.datasets_root, out_dir, name, spec["directories"],
            spec["audio_extensions"], spec["transcript_extension"],
            n_processes=args.n_processes, skip_existing=args.skip_existing,
        )
