"""Default eval hooks wired into the trainers.

Capability parity with the reference's in-training evaluation:
  * synthesizer — attention plot + Griffin-Lim wav + mel plot per eval step
    (ref: synthesizer/train.py:302-317, 485-574);
  * encoder — 2-D projection of the batch embedding space at intervals (the
    reference renders UMAP projections, ref: encoder/train.py:124-130,
    encoder/visualizations.py:520-551; PCA fills the same role here).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from rtvc_tpu.config import preprocessing, sp
from rtvc_tpu.utils.io import save_wav
from rtvc_tpu.utils.plots import save_attention, save_spectrogram


def make_tacotron_eval_hook(out_dir: Path, texts=None, embeds=None,
                            gl_iters: int = 30, max_steps: int = 400):
    """Returns hook(step, variables, r): generates eval samples + artifacts."""
    from rtvc_tpu.models import factories
    from rtvc_tpu.models.tacotron import tacotron_generate

    out_dir = Path(out_dir)
    if texts is None:
        texts = ["this is an evaluation sample."]
    if embeds is None:
        rng = np.random.default_rng(0)
        e = rng.standard_normal(768).astype(np.float32)
        embeds = [e / np.linalg.norm(e)]

    from rtvc_tpu.text import text_to_sequence

    def hook(step: int, variables: Dict, r: int):
        bundle = factories.init_syn_model(factories.MODEL_TYPE_TACOTRON)
        d = bundle.dims
        import jax.numpy as jnp

        from rtvc_tpu.ops.audio import inv_mel_spectrogram

        seqs = [text_to_sequence(t, preprocessing.cleaner_names) for t in texts]
        max_len = -(-max(len(s) for s in seqs) // 16) * 16
        chars = np.zeros((len(seqs), max_len), np.int32)
        for i, s in enumerate(seqs):
            chars[i, : len(s)] = s
        mel, _, attn, n = tacotron_generate(
            variables, d, jnp.asarray(chars),
            jnp.asarray(np.stack(embeds)), r, jax.random.PRNGKey(step),
            max_steps=(max_steps // r) * r,
        )
        n = max(int(n), r)
        mel_np = np.asarray(mel)[0, :, :n]
        save_attention(np.asarray(attn)[0, : n // r],
                       out_dir / f"attention_{step}", f"step {step}")
        save_spectrogram(mel_np, out_dir / f"mel_{step}", f"step {step}")
        wav = np.asarray(
            inv_mel_spectrogram(
                jnp.asarray(mel_np), sp,
                preprocessing.replace(griffin_lim_iters=gl_iters),
                jax.random.PRNGKey(0),
            )
        )
        save_wav(wav, out_dir / f"eval_{step}.wav", sp.sample_rate)

    return hook


def make_encoder_projection_hook(out_dir: Path, speakers_per_batch: int):
    """Returns hook(step, embeds): PCA projection of the batch embedding space
    colored by speaker."""
    out_dir = Path(out_dir)

    def hook(step: int, embeds: np.ndarray):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.decomposition import PCA

        embeds = np.asarray(embeds)
        n = embeds.shape[0]
        ups = n // speakers_per_batch
        pts = PCA(n_components=2).fit_transform(embeds)
        out_dir.mkdir(parents=True, exist_ok=True)
        fig, ax = plt.subplots(figsize=(5, 5))
        for s in range(speakers_per_batch):
            seg = pts[s * ups : (s + 1) * ups]
            ax.scatter(seg[:, 0], seg[:, 1], c=[plt.cm.tab20(s % 20)], s=12)
        ax.set_title(f"embedding projection @ step {step}")
        fig.savefig(out_dir / f"projection_{step}.png", dpi=110,
                    bbox_inches="tight")
        plt.close(fig)

    return hook
