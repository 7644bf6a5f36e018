"""GTA synthesis: generate synthesizer mels for vocoder training
(ref: vocoder_preprocess.py)."""
import argparse
from pathlib import Path

from rtvc_tpu.inference.synthesizer import Synthesizer
from rtvc_tpu.train.gta import run_synthesis

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("datasets_root", type=Path)
    parser.add_argument("-i", "--in_dir", type=Path, default=None,
                        help="Synthesizer dataset dir (default <root>/SV2TTS/synthesizer)")
    parser.add_argument("-o", "--out_dir", type=Path, default=None,
                        help="Vocoder dataset dir (default <root>/SV2TTS/vocoder)")
    parser.add_argument(
        "-s", "--syn_model_fpath", type=Path,
        default=Path("saved_models/default/synthesizer.ckpt"),
    )
    parser.add_argument("--ground_truth", action="store_true",
                        help="Skip GTA; train the vocoder on ground-truth mels.")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--skip_existing", action="store_true")
    args = parser.parse_args()

    in_dir = args.in_dir or args.datasets_root / "SV2TTS" / "synthesizer"
    out_dir = args.out_dir or args.datasets_root / "SV2TTS" / "vocoder"

    if args.ground_truth:
        print("--ground_truth set: vocoder will read mels straight from %s" % in_dir)
    else:
        synth = Synthesizer(args.syn_model_fpath)
        synth.load()
        run_synthesis(
            in_dir, out_dir, synth._model, r=synth._r,
            batch_size=args.batch_size, skip_existing=args.skip_existing,
        )
