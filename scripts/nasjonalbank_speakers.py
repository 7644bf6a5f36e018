"""Nasjonalbank (Norwegian/Nordic speech bank) → speakers layout.

Speaker identity is the last two directory levels above each wav
(``<session>/<speaker>/file.wav`` → id ``session_speaker``), optionally
scoped to one language subtree (ref: scripts/nasjonal_speakers.py:28-60).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _grouping import add_common_args, copy_speaker_layout, group_files, require_dir  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Flatten a nasjonalbank language tree into speakers/.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_common_args(parser)
    parser.add_argument("--lang", type=str, default=None,
                        help="Language subdirectory (e.g. 'no', 'sv').")
    parser.set_defaults(min=12)
    args = parser.parse_args()
    require_dir(args.datasets_root)

    base = args.datasets_root / args.lang if args.lang else args.datasets_root
    out_dir = args.out_dir or base
    print("Searching %s for wav files..." % base)
    files = [f for f in base.glob("**/*.wav") if f.is_file()]
    print("  found %d" % len(files))
    groups = group_files(files, lambda f: "%s_%s" % (f.parts[-3], f.parts[-2]))
    n = copy_speaker_layout(groups, out_dir, args.min, args.max,
                            args.threads, args.seed)
    print("Wrote %d speakers to %s" % (n, out_dir / "speakers"))
