"""Preprocess datasets for speaker-encoder training (ref: encoder_preprocess.py)."""
import argparse
from pathlib import Path

from rtvc_tpu.config import datasets as registry
from rtvc_tpu.data.encoder_preprocess import encoder_preprocess_dataset

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Preprocesses audio files from datasets into mel "
        "spectrograms for speaker-encoder training.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("datasets_root", type=Path)
    parser.add_argument("-o", "--out_dir", type=Path, default=None)
    parser.add_argument(
        "-d", "--datasets", type=str,
        default="librispeech_other,voxceleb1,voxceleb2",
        help="Comma-separated list of dataset names (see "
        "rtvc_tpu/config/datasets.py).",
    )
    parser.add_argument("-s", "--skip_existing", action="store_true")
    parser.add_argument("-t", "--threads", type=int, default=4)
    args = parser.parse_args()

    out_dir = args.out_dir or args.datasets_root / "SV2TTS" / "encoder"
    out_dir.mkdir(parents=True, exist_ok=True)

    # name → list of relative corpus paths (ref mapping: encoder_preprocess.py:69-117)
    name_map = {
        "librispeech_clean": registry.librispeech_datasets["train"]["clean"],
        "librispeech_other": registry.librispeech_datasets["train"]["other"],
        "libritts_clean": registry.libritts_datasets["train"]["clean"],
        "libritts_other": registry.libritts_datasets["train"]["other"],
        "voxceleb1": registry.voxceleb_datasets["voxceleb1"]["train"],
        "voxceleb2": registry.voxceleb_datasets["voxceleb2"]["train"],
        "vctk": registry.other_datasets["VCTK"],
        "nasjonalbank": registry.other_datasets["nasjonalbank"],
        **{k: v for k, v in registry.slr_datasets_wav.items()},
        **{k: v for k, v in registry.slr_datasets_flac.items()},
        "commonvoice-7-all": registry.commonvoice_datasets["commonvoice-7"]["all"],
        "commonvoice-7-en": registry.commonvoice_datasets["commonvoice-7"]["en"],
    }
    for name in args.datasets.split(","):
        name = name.strip()
        if name not in name_map:
            print("Unknown dataset %r — known: %s" % (name, sorted(name_map)))
            continue
        encoder_preprocess_dataset(
            args.datasets_root, out_dir, name_map[name], name,
            skip_existing=args.skip_existing, n_threads=args.threads,
        )
