"""Create speaker embeddings for synthesizer training
(ref: synthesizer_preprocess_embeds.py)."""
import argparse
from pathlib import Path

from rtvc_tpu.data.synthesizer_preprocess import create_embeddings

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("synthesizer_root", type=Path)
    parser.add_argument(
        "-e", "--encoder_model_fpath", type=Path,
        default=Path("saved_models/default/encoder.ckpt"),
    )
    parser.add_argument("-n", "--n_processes", type=int, default=4)
    parser.add_argument("-s", "--skip_existing", action="store_true")
    args = parser.parse_args()

    create_embeddings(
        args.synthesizer_root, args.encoder_model_fpath,
        skip_existing=args.skip_existing, n_processes=args.n_processes,
    )
