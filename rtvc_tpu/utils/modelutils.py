"""Friendly missing-checkpoint UX (ref: utils/modelutils.py:3-24).

The reference's ``check_model_paths`` prints download instructions and
quits when no model files exist; this framework ships no pretrained
checkpoints, so the actionable guidance is how to TRAIN each stage (or run
the random-weight self-test). Used by ``demo_cli`` and ``rtvc_tpu.serve``
so a fresh install fails with instructions, not a stack trace or a silent
skip.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

_STAGE_HELP = {
    "encoder": "python encoder_preprocess.py <datasets_root> && "
               "python encoder_train.py my_run <datasets_root>/SV2TTS/encoder",
    "synthesizer": "python synthesizer_preprocess_audio.py <datasets_root> && "
                   "python synthesizer_preprocess_embeds.py "
                   "<datasets_root>/SV2TTS/synthesizer && "
                   "python synthesizer_train.py my_run "
                   "<datasets_root>/SV2TTS/synthesizer",
    "vocoder": "python vocoder_preprocess.py <datasets_root> && "
               "python vocoder_train.py my_run <datasets_root>",
}


def missing_models(
    encoder_path: Path, synthesizer_path: Path, vocoder_path: Path
) -> Dict[str, Path]:
    """Stage-name → path for every checkpoint path that does not exist."""
    paths = {
        "encoder": Path(encoder_path),
        "synthesizer": Path(synthesizer_path),
        "vocoder": Path(vocoder_path),
    }
    return {
        name: p
        for name, p in paths.items()
        if not (p.is_file() or p.is_dir())
    }


def model_files_missing(missing: Optional[Dict[str, Path]] = None,
                        type: Optional[str] = None) -> None:
    """Print actionable guidance for absent checkpoints (the reference
    prints its pretrained-models wiki link, ref: utils/modelutils.py:16-24;
    this framework's equivalent is the per-stage training commands)."""
    bar = "*" * 80
    print(bar)
    if type is not None:
        print(f"Error: {type} model files not found.")
    elif missing:
        print("Error: model files not found for: " + ", ".join(missing))
    else:
        print("Error: model files not found.")
    if missing:
        for name, p in missing.items():
            print(f"  {name}: expected a checkpoint at {p}")
    print("\nTo obtain models, train each stage (docs/TRAINING.md):")
    for name, cmd in _STAGE_HELP.items():
        if missing is None or name in missing:
            print(f"  {name}:\n    {cmd}")
    print("\nOr run `python demo_cli.py --selftest` to exercise the full "
          "pipeline\nwith random weights (no checkpoints needed).")
    print(bar + "\n")


def check_model_paths(
    encoder_path: Path, synthesizer_path: Path, vocoder_path: Path
) -> List[str]:
    """Validate the three stage checkpoints; print guidance and raise
    ``SystemExit`` when NONE exist (the reference's contract,
    ref: utils/modelutils.py:3-14). Returns the names of individually
    missing stages so callers can warn on partial installs."""
    missing = missing_models(encoder_path, synthesizer_path, vocoder_path)
    if len(missing) == 3:
        model_files_missing(missing)
        raise SystemExit(-1)
    return list(missing)
