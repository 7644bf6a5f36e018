"""SLR82 (CN-Celeb) and other per-speaker-directory flac corpora →
speakers layout.

Each top-level directory is one speaker; recordings are flac files nested
below it (ref: scripts/slr82_speakers.py:30-66).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _grouping import add_common_args, copy_speaker_layout, require_dir  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Flatten a per-speaker-directory corpus into speakers/.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_common_args(parser)
    parser.add_argument("--ext", type=str, default="flac",
                        help="Audio extension to collect.")
    args = parser.parse_args()
    require_dir(args.datasets_root)

    out_dir = args.out_dir or args.datasets_root
    groups = {
        d.name: sorted(d.glob("**/*.%s" % args.ext))
        for d in sorted(args.datasets_root.iterdir())
        if d.is_dir()
    }
    n = copy_speaker_layout(groups, out_dir, args.min, args.max,
                            args.threads, args.seed)
    print("Wrote %d speakers to %s" % (n, out_dir / "speakers"))
