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
from typing import Dict

import jax
import numpy as np

from rtvc_tpu.config import preprocessing, sp
from rtvc_tpu.utils.io import save_wav
from rtvc_tpu.utils.plots import save_attention, save_spectrogram


def make_tacotron_eval_hook(out_dir: Path, texts=None, embeds=None,
                            gl_iters: int = 30, max_steps: int = 400,
                            dims=None):
    """Returns hook(step, variables, r): generates eval samples + artifacts.
    ``dims`` defaults to the production TacotronDims; pass explicitly when
    training with overridden hparams."""
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
        d = dims or factories.init_syn_model(factories.MODEL_TYPE_TACOTRON).dims
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
    """Returns hook(step, embeds): neighbor-embedding (t-SNE) projection of
    the batch embedding space colored by speaker — the UMAP role in the
    reference dashboards (ref: encoder/visualizations.py:520-551)."""
    out_dir = Path(out_dir)

    def hook(step: int, embeds: np.ndarray):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rtvc_tpu.utils.projection import project_2d

        embeds = np.asarray(embeds)
        n = embeds.shape[0]
        ups = n // speakers_per_batch
        pts = project_2d(embeds)
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


def make_nar_eval_hook(out_dir: Path, model_type: str, texts=None,
                       embeds=None, gl_iters: int = 30, dims=None):
    """NAR synthesizer eval: mel plot + GL wav, plus the reference's
    pitch/energy modifier sweep grids (ref: synthesizer/train.py:485-574 —
    3×3 GTA-vs-target sweeps rendered as plots)."""
    from rtvc_tpu.models import factories
    from rtvc_tpu.text import text_to_sequence
    from rtvc_tpu.utils.plots import save_series_grid

    out_dir = Path(out_dir)
    if texts is None:
        texts = ["this is an evaluation sample."]
    if embeds is None:
        rng = np.random.default_rng(0)
        e = rng.standard_normal(768).astype(np.float32)
        embeds = [e / np.linalg.norm(e)]

    def hook(step: int, variables: Dict, r: int):
        import jax.numpy as jnp

        from rtvc_tpu.ops.audio import inv_mel_spectrogram

        d = dims or factories.init_syn_model(model_type).dims
        if model_type == factories.MODEL_TYPE_FORWARD_TACOTRON:
            from rtvc_tpu.models.forward_tacotron import forward_generate as gen
        else:
            from rtvc_tpu.models.fast_pitch import fastpitch_generate as gen

        seqs = [text_to_sequence(t, preprocessing.cleaner_names) for t in texts]
        max_len = -(-max(len(s) for s in seqs) // 16) * 16
        chars = np.zeros((len(seqs), max_len), np.int32)
        for i, s in enumerate(seqs):
            chars[i, : len(s)] = s
        chars = jnp.asarray(chars)
        spk = jnp.asarray(np.stack(embeds))

        mel, durs = gen(variables, d, chars, spk, jax.random.PRNGKey(step))
        n = int(durs[0].sum())
        mel0 = mel[0][:, : max(n, 1)]
        save_spectrogram(mel0, out_dir / f"mel_{step}", f"step {step}")
        wav = np.asarray(
            inv_mel_spectrogram(
                jnp.asarray(mel0), sp,
                preprocessing.replace(griffin_lim_iters=gl_iters),
                jax.random.PRNGKey(0),
            )
        )
        save_wav(wav, out_dir / f"eval_{step}.wav", sp.sample_rate)

        # pitch/energy modifier sweep (× 0.5 / 1.0 / 1.5)
        pitch_rows, energy_rows, labels = [], [], []
        for factor in (0.5, 1.0, 1.5):
            m_p, _ = gen(variables, d, chars, spk, jax.random.PRNGKey(step),
                         pitch_function=lambda p, f=factor: p * f)
            m_e, _ = gen(variables, d, chars, spk, jax.random.PRNGKey(step),
                         energy_function=lambda p, f=factor: p * f)
            pitch_rows.append(m_p[0].mean(axis=0))
            energy_rows.append(m_e[0].mean(axis=0))
            labels.append(f"×{factor}")
        save_series_grid(pitch_rows, labels, out_dir / f"pitch_sweep_{step}",
                         f"pitch modifier sweep @ {step}")
        save_series_grid(energy_rows, labels, out_dir / f"energy_sweep_{step}",
                         f"energy modifier sweep @ {step}")

    return hook
