"""Training/eval artifact plots (matplotlib, headless).

Capability parity with the reference's artifact dumps: attention plots +
spectrogram images at eval steps (ref: utils/display.py:save_attention/
save_spectrogram, synthesizer/train.py:302-317, 485-574 — incl. the
GTA-vs-target grids with pitch/energy modifier sweeps) and the vocoder's
target/generated comparison plots (ref: vocoder/display.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_attention(attn: np.ndarray, path: Path, title: str = "") -> Path:
    """Attention matrix (T_dec, T_text) → PNG."""
    plt = _plt()
    path = Path(path).with_suffix(".png")
    path.parent.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(np.asarray(attn).T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("decoder step")
    ax.set_ylabel("text position")
    ax.set_title(title)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def save_spectrogram(mel: np.ndarray, path: Path, title: str = "") -> Path:
    """Mel (n_mels, T) → PNG."""
    plt = _plt()
    path = Path(path).with_suffix(".png")
    path.parent.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 3))
    im = ax.imshow(np.asarray(mel), aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def save_mel_comparison(
    target: np.ndarray, generated: np.ndarray, path: Path, title: str = ""
) -> Path:
    """Target vs generated mel, stacked (GTA eval grids,
    ref: synthesizer/train.py:485-574)."""
    plt = _plt()
    path = Path(path).with_suffix(".png")
    path.parent.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    for ax, m, label in zip(axes, (target, generated), ("target", "generated")):
        im = ax.imshow(np.asarray(m), aspect="auto", origin="lower",
                       interpolation="none")
        fig.colorbar(im, ax=ax)
        ax.set_ylabel(label)
    axes[0].set_title(title)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def save_series_grid(
    series: Sequence[np.ndarray],
    labels: Sequence[str],
    path: Path,
    title: str = "",
) -> Path:
    """Stacked 1-D series (pitch/energy sweeps)."""
    plt = _plt()
    path = Path(path).with_suffix(".png")
    path.parent.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 3))
    for s, label in zip(series, labels):
        ax.plot(np.asarray(s), label=label, linewidth=1)
    ax.legend(fontsize=7)
    ax.set_title(title)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def save_wave_comparison(
    waves: Sequence[np.ndarray], labels: Sequence[str], path: Path
) -> Path:
    """Stacked waveforms (vocoder target / Griffin-Lim / generated triplets,
    ref: vocoder/gen_wavernn.py artifacts)."""
    plt = _plt()
    path = Path(path).with_suffix(".png")
    path.parent.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(len(waves), 1, figsize=(8, 2 * len(waves)),
                             sharex=True)
    if len(waves) == 1:
        axes = [axes]
    for ax, w, label in zip(axes, waves, labels):
        ax.plot(np.asarray(w), linewidth=0.4)
        ax.set_ylabel(label)
        ax.set_ylim(-1.05, 1.05)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path
