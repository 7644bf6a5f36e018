"""OpenSLR corpora with speaker-prefixed filenames → speakers layout.

Many SLR sets name files ``<set>_<speaker>_<utt>.wav``; the speaker id is
the first two underscore-separated parts (ref: scripts/slr_speakers.py:11-31).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _grouping import add_common_args, copy_speaker_layout, group_files, require_dir  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Group an OpenSLR corpus by filename prefix into speakers/.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_common_args(parser)
    parser.add_argument("--parts", type=int, default=2,
                        help="Underscore-separated filename parts forming "
                             "the speaker id.")
    args = parser.parse_args()
    require_dir(args.datasets_root)

    out_dir = args.out_dir or args.datasets_root
    files = [f for f in args.datasets_root.glob("**/*.wav") if f.is_file()]
    print("Found %d wav files." % len(files))
    groups = group_files(
        files, lambda f: "_".join(f.stem.split("_")[: args.parts])
    )
    n = copy_speaker_layout(groups, out_dir, args.min, args.max,
                            args.threads, args.seed)
    print("Wrote %d speakers to %s" % (n, out_dir / "speakers"))
