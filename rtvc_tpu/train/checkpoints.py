"""Checkpoint save/load with the reference's auto-detect contract.

The reference persists ``{step, model_state, optimizer_state[, model_type]}``
torch dicts and detects the architecture from the ``model_type`` key at load
(ref: synthesizer/train.py:445-463, vocoder/train.py:308-324,
synthesizer/inference.py:59-62). Here the same contract is kept over a
msgpack-serialized pytree (flax.serialization): ``{step, model_type, params,
opt_state, extras}``, one file, plus rolling-save/immutable-backup helpers
(ref cadence: encoder/train.py:133-150).

Torch ``.pt`` checkpoints from the reference load transparently through the
per-model importers (``rtvc_tpu.models.*.import_torch_state``) — the
migration path for existing users.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

MAGIC = b"RTVCTPU1"


def _to_numpy_tree(tree: Any) -> Any:
    import jax

    # to_state_dict flattens arbitrary pytree containers (optax states,
    # NamedTuples) into plain nested dicts that msgpack can serialize.
    tree = serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str | Path,
    params: Any,
    step: int,
    model_type: Optional[str] = None,
    opt_state: Any = None,
    extras: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomically write a checkpoint file."""
    path = Path(path)
    extras = dict(extras) if extras else {}
    # Non-array metadata (model config, notes) rides in the JSON header —
    # msgpack's ndarray codec can't round-trip string leaves.
    config = extras.pop("config", None)
    payload = {
        "meta": json.dumps(
            {
                "step": int(step),
                "model_type": model_type,
                "format": 1,
                "config": config,
            }
        ),
        "params": _to_numpy_tree(params),
        "opt_state": _to_numpy_tree(opt_state) if opt_state is not None else {},
        "extras": _to_numpy_tree(extras),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.parent.mkdir(parents=True, exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(blob)
    tmp.replace(path)


def _restore_lists(tree: Any) -> Any:
    """Invert flax's to_state_dict list→{'0': ..} conversion: any dict whose
    keys are exactly '0'..'n-1' becomes a list again."""
    if isinstance(tree, dict):
        restored = {k: _restore_lists(v) for k, v in tree.items()}
        keys = list(restored.keys())
        if keys and all(isinstance(k, str) and k.isdigit() for k in keys):
            idx = sorted(int(k) for k in keys)
            if idx == list(range(len(idx))):
                return [restored[str(i)] for i in idx]
        return restored
    return tree


def load_checkpoint(path: str | Path, trust_pickle: bool = False) -> Dict[str, Any]:
    """Load a checkpoint → dict with step / model_type / params / opt_state /
    extras. Reference torch ``.pt`` files are detected and returned as
    ``{"torch_state": state_dict, "step": ..., "model_type": ...}`` for the
    caller to run through a model importer."""
    path = Path(path)
    with open(path, "rb") as f:
        head = f.read(len(MAGIC))
        if head == MAGIC:
            payload = serialization.msgpack_restore(f.read())
            meta = json.loads(payload["meta"])
            extras = _restore_lists(payload.get("extras")) or {}
            if meta.get("config") is not None:
                extras["config"] = meta["config"]
            return {
                "step": meta["step"],
                "model_type": meta.get("model_type"),
                "params": _restore_lists(payload["params"]),
                "opt_state": _restore_lists(payload.get("opt_state")) or None,
                "extras": extras,
            }
    # Fall back to a torch checkpoint from the reference framework. Reference
    # model_state dicts are plain tensors, so the safe weights-only loader
    # handles them; a full-pickle load executes arbitrary code from the file
    # and is only allowed behind an explicit opt-in.
    import torch

    try:
        ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        if not trust_pickle:
            raise RuntimeError(
                f"{path} is not an RTVCTPU1 checkpoint and could not be "
                "loaded with torch.load(weights_only=True). If you trust the "
                "file, pass trust_pickle=True to allow a full pickle load "
                "(this executes code embedded in the file)."
            )
        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    state = {
        k: v.numpy() if hasattr(v, "numpy") else v
        for k, v in ckpt.get("model_state", {}).items()
    }
    return {
        "step": int(ckpt.get("step", 0)),
        "model_type": ckpt.get("model_type"),
        "params": None,
        "opt_state": None,
        "extras": {},
        "torch_state": state,
    }


def backup_checkpoint(path: str | Path, backup_dir: str | Path, step: int) -> Path:
    """Immutable snapshot copy (ref backup_every, encoder/train.py:139-146)."""
    path, backup_dir = Path(path), Path(backup_dir)
    backup_dir.mkdir(parents=True, exist_ok=True)
    dest = backup_dir / f"{path.stem}_{step:09d}{path.suffix}"
    shutil.copyfile(path, dest)
    return dest
