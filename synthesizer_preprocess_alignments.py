"""Create duration/pitch/energy alignment features for NAR synthesizers
(ref: synthesizer_preprocess_alignments.py)."""
import argparse
from pathlib import Path

from rtvc_tpu.data.synthesizer_preprocess import create_align_features

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("synthesizer_root", type=Path)
    parser.add_argument(
        "-m", "--synthesizer_model_fpath", type=Path,
        default=Path("saved_models/default/synthesizer.ckpt"),
        help="Trained Tacotron checkpoint used for attention extraction.",
    )
    parser.add_argument("-s", "--skip_existing", action="store_true")
    from rtvc_tpu.parallel import distributed as dist

    dist.add_launch_args(parser)
    args = parser.parse_args()
    dist.setup_from_args(args)  # shards the utterance list by process

    create_align_features(
        args.synthesizer_root, args.synthesizer_model_fpath,
        skip_existing=args.skip_existing,
    )
