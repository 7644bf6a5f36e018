"""Checkpoint-time vocoder sample generation.

Capability parity with the reference's ``gen_testset`` (ref:
vocoder/gen_wavernn.py:5-38, called from vocoder/train.py:269-271): at each
checkpoint, render a few utterances three ways — ground-truth decode,
Griffin-Lim reference, and WaveRNN generation — plus a waveform comparison
plot, so training quality is audible/visible without metrics.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import numpy as np

from rtvc_tpu.config import preprocessing, sp
from rtvc_tpu.config.vocoder import MODE_MOL, WaveRNNParams
from rtvc_tpu.models.wavernn import WaveRNNDims, wavernn_generate
from rtvc_tpu.utils.io import save_wav
from rtvc_tpu.utils.plots import save_wave_comparison


def gen_testset(
    variables: Dict,
    dims: WaveRNNDims,
    cfg: WaveRNNParams,
    dataset,
    save_dir: Path,
    step: int,
    samples: int = 2,
    batched: bool = True,
    seed: int = 0,
) -> None:
    """Generate eval triplets for the first ``samples`` dataset items."""
    import jax.numpy as jnp

    from rtvc_tpu.ops.audio import inv_mel_spectrogram, label_2_float, decode_mu_law

    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    for i in range(min(samples, len(dataset))):
        mel, quant, _ = dataset[i]

        # ground-truth decode (ref: gen_wavernn.py:15-23)
        bits = 16 if cfg.mode == MODE_MOL else cfg.bits
        if cfg.mu_law and cfg.mode != MODE_MOL:
            gt = np.asarray(
                decode_mu_law(jnp.asarray(quant, jnp.float32), 2**bits, True)
            )
        else:
            gt = np.asarray(label_2_float(jnp.asarray(quant, jnp.float32), bits))
        save_wav(gt, save_dir / f"{step}_{i}_target.wav", sp.sample_rate)

        # Griffin-Lim reference from the (denormalized) mel
        gl = np.asarray(
            inv_mel_spectrogram(
                jnp.asarray(mel * sp.max_abs_value), sp,
                preprocessing.replace(griffin_lim_iters=30),
                jax.random.PRNGKey(seed),
            )
        )
        save_wav(gl, save_dir / f"{step}_{i}_griffinlim.wav", sp.sample_rate)

        # WaveRNN generation
        gen = wavernn_generate(
            variables, dims, mel * sp.max_abs_value / sp.max_abs_value,
            jax.random.PRNGKey(seed + i), batched=batched,
            target=cfg.gen_target, overlap=cfg.gen_overlap,
            mu_law=cfg.mu_law, apply_preemphasis=sp.preemphasize,
        )
        save_wav(gen, save_dir / f"{step}_{i}_generated.wav", sp.sample_rate)

        n = min(len(gt), len(gl), len(gen))
        save_wave_comparison(
            [gt[:n], gl[:n], gen[:n]],
            ["target", "griffin-lim", "generated"],
            save_dir / f"{step}_{i}_compare",
        )
