"""Shared helper for the per-corpus speaker-grouping adapters.

The reference ships one near-identical script per corpus (ref:
scripts/nasjonal_speakers.py, scripts/slr_speakers.py,
scripts/slr82_speakers.py — find files, group into speakers, drop groups
under --min, random-cap at --max, copy into a ``speakers/<id>/`` layout that
``encoder_preprocess.py`` / ``synthesizer_preprocess_audio.py`` consume).
Here the shared machinery lives once and each adapter only supplies the
grouping rule.
"""
from __future__ import annotations

import random
import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Callable, Dict, Iterable, List


def group_files(
    files: Iterable[Path], speaker_of: Callable[[Path], str]
) -> Dict[str, List[Path]]:
    groups: Dict[str, List[Path]] = {}
    for f in files:
        groups.setdefault(speaker_of(f), []).append(f)
    return groups


def copy_speaker_layout(
    groups: Dict[str, List[Path]],
    out_dir: Path,
    min_files: int,
    max_files: int,
    n_threads: int = 8,
    seed: int = 0,
) -> int:
    """Copy capped speaker groups into ``out_dir/speakers/<id>/``. Returns
    the number of speakers written. Idempotent (existing files skipped)."""
    rng = random.Random(seed)
    kept = {s: fs for s, fs in sorted(groups.items()) if len(fs) >= min_files}
    print(
        "Found %d speakers; keeping %d with >= %d files."
        % (len(groups), len(kept), min_files)
    )

    def process(item):
        speaker, paths = item
        if len(paths) > max_files:
            paths = list(paths)
            rng.shuffle(paths)
            paths = paths[:max_files]
        dest = out_dir / "speakers" / speaker
        dest.mkdir(parents=True, exist_ok=True)
        for src in paths:
            target = dest / src.name
            if not target.exists():
                shutil.copyfile(src, target)

    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        list(pool.map(process, kept.items()))
    return len(kept)


def require_dir(path: Path) -> Path:
    if not Path(path).is_dir():
        raise SystemExit("error: datasets_root %s is not a directory" % path)
    return Path(path)


def add_common_args(parser) -> None:
    parser.add_argument("datasets_root", type=Path)
    parser.add_argument("-o", "--out_dir", type=Path, default=None)
    parser.add_argument("--min", type=int, default=5,
                        help="Minimum files per speaker.")
    parser.add_argument("--max", type=int, default=40,
                        help="Maximum files per speaker (random subset).")
    parser.add_argument("-t", "--threads", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
