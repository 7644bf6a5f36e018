"""Toolbox — the reference's Qt GUI capabilities as a CLI/library surface.

The reference toolbox (ref: toolbox/toolbox.py:46-473, toolbox/ui.py) offers:
dataset browsing, utterance recording/loading, embedding visualization
(heatmap + UMAP projection), mel display, synthesize/vocode with a
PyTorch↔libwavernn backend toggle, RTF display, and seed **autotune**
(search for the generation seed minimizing the embedding distance between the
reference voice and the generated audio, ref: toolbox/toolbox.py:413-473).

No Qt in this environment, so the same capabilities are exposed three ways:
composable functions (this module), a CLI (demo_toolbox.py) and an
interactive full-screen terminal UI (rtvc_tpu/tui.py, `demo_toolbox.py
tui`). Plots are written as PNGs, audio as WAVs. The embedding projection
uses the self-contained t-SNE (utils/projection.py).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from rtvc_tpu.config import sp
from rtvc_tpu.inference import encoder as encoder_inf
from rtvc_tpu.inference import synthesizer as synthesizer_inf
from rtvc_tpu.inference import vocoder as vocoder_inf
from rtvc_tpu.utils.io import save_wav

VOC_BACKEND_JAX = "pytorch"  # compat name for the reference's toggle
VOC_BACKEND_NATIVE = "libwavernn"


def vocode_with_rtf(spec: np.ndarray,
                    seed: Optional[int] = None) -> Tuple[np.ndarray, float]:
    """Mel → waveform; returns (wav, real-time factor)
    (RTF instrument, ref: toolbox/toolbox.py:293-298). Shared by the
    Toolbox, the TUI, and the web UI."""
    if seed is not None:
        vocoder_inf.set_seed(seed)
    t0 = time.perf_counter()
    wav = vocoder_inf.infer_waveform(spec)
    dt = time.perf_counter() - t0
    rtf = (len(wav) / sp.sample_rate) / max(dt, 1e-9)
    return wav, rtf


def autotune_search(synth, embed: np.ndarray, text: str, n_seeds: int = 10,
                    start_seed: int = 0, verbose: bool = True):
    """Seed search minimizing the embedding distance between the reference
    voice and the generated audio (ref: toolbox/toolbox.py:413-473).
    Returns (best_seed, best_similarity, best_wav, best_mel); best_wav is
    None when no seed produced voiced audio."""
    best = (-1, -np.inf, None, None)
    for seed in range(start_seed, start_seed + n_seeds):
        [spec] = synth.synthesize_spectrograms([text], [embed], seed=seed)
        wav, _ = vocode_with_rtf(spec, seed=seed)
        processed = encoder_inf.preprocess_wav(
            np.pad(np.asarray(wav, np.float32), (0, sp.sample_rate))
        )
        if len(processed) == 0:
            continue
        gen_embed = encoder_inf.embed_utterance(processed)
        sim = float(np.dot(gen_embed, embed))
        if verbose:
            print("  seed %d → voice similarity %.4f" % (seed, sim))
        if sim > best[1]:
            best = (seed, sim, wav, spec)
    return best


@dataclass
class Utterance:
    name: str
    speaker_name: str
    wav: np.ndarray
    embed: np.ndarray
    partial_embeds: Optional[np.ndarray] = None


@dataclass
class Toolbox:
    """Headless toolbox session state."""

    datasets_root: Optional[Path] = None
    out_dir: Path = Path("toolbox_out")
    utterances: List[Utterance] = field(default_factory=list)
    synthesizer: Optional[synthesizer_inf.Synthesizer] = None

    # -- dataset browsing (ref: toolbox/toolbox.py dataset box) -------------
    def browse_datasets(self, max_entries: int = 20) -> List[Path]:
        if self.datasets_root is None:
            return []
        wavs = sorted(Path(self.datasets_root).glob("**/*.wav"))
        return wavs[:max_entries]

    def record(self, duration_s: float = 5.0) -> np.ndarray:
        """Microphone recording (the reference toolbox records via
        sounddevice). No audio input device exists in this environment —
        raises with the workaround."""
        raise RuntimeError(
            "No audio input device is available in this environment. Record "
            "a wav elsewhere and pass it to load_utterance()/clone instead."
        )

    # -- embedding ------------------------------------------------------------
    def load_utterance(self, fpath: Path, speaker_name: Optional[str] = None) -> Utterance:
        wav = encoder_inf.preprocess_wav(fpath)
        embed, partials, _ = encoder_inf.embed_utterance(wav, return_partials=True)
        utt = Utterance(
            name=Path(fpath).stem,
            speaker_name=speaker_name or Path(fpath).parent.name,
            wav=wav,
            embed=embed,
            partial_embeds=partials,
        )
        self.utterances.append(utt)
        return utt

    def save_embedding_heatmap(self, utt: Utterance, out: Optional[Path] = None) -> Path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        out = out or Path(self.out_dir) / f"embed_{utt.name}.png"
        out.parent.mkdir(parents=True, exist_ok=True)
        fig, ax = plt.subplots(figsize=(4, 4))
        encoder_inf.plot_embedding_as_heatmap(utt.embed, ax=ax, title=utt.name)
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out

    def save_projection(self, out: Optional[Path] = None) -> Optional[Path]:
        """2-D projection of all loaded utterance embeddings, colored by
        speaker (UMAP role, ref: toolbox/ui.py draw_umap_projections —
        rendered with the self-contained t-SNE, PCA fallback for tiny n)."""
        if len(self.utterances) < 2:
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rtvc_tpu.utils.projection import project_2d

        embeds = np.stack([u.embed for u in self.utterances])
        pts = project_2d(embeds)
        speakers = sorted({u.speaker_name for u in self.utterances})
        colors = {s: i for i, s in enumerate(speakers)}
        out = out or Path(self.out_dir) / "projection.png"
        out.parent.mkdir(parents=True, exist_ok=True)
        fig, ax = plt.subplots(figsize=(5, 5))
        for u, (x, y) in zip(self.utterances, pts):
            ax.scatter(x, y, c=[plt.cm.tab10(colors[u.speaker_name] % 10)])
            ax.annotate(u.name, (x, y), fontsize=6)
        ax.set_title("Utterance embeddings (t-SNE projection)")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out

    # -- synthesis / vocoding ---------------------------------------------------
    def synthesize(self, text: str, utt: Utterance, seed: int = 0) -> np.ndarray:
        assert self.synthesizer is not None, "load a synthesizer first"
        specs = self.synthesizer.synthesize_spectrograms(
            [text], [utt.embed], seed=seed
        )
        return specs[0]

    def vocode(
        self, spec: np.ndarray, seed: Optional[int] = None,
        backend: str = VOC_BACKEND_JAX,
    ) -> Tuple[np.ndarray, float]:
        """Mel → waveform; returns (wav, real-time factor)
        (RTF instrument, ref: toolbox/toolbox.py:293-298)."""
        return vocode_with_rtf(spec, seed=seed)

    def save_audio(self, wav: np.ndarray, name: str) -> Path:
        out = Path(self.out_dir) / f"{name}.wav"
        out.parent.mkdir(parents=True, exist_ok=True)
        save_wav(wav, out, sp.sample_rate)
        return out

    # -- autotune (ref: toolbox/toolbox.py:413-473) -----------------------------
    def autotune(
        self,
        text: str,
        utt: Utterance,
        n_seeds: int = 10,
        start_seed: int = 0,
    ) -> Tuple[int, float, np.ndarray]:
        """Search generation seeds for the one whose cloned audio embeds
        closest to the reference voice. Returns (best_seed, best_similarity,
        best_wav)."""
        assert self.synthesizer is not None, "load a synthesizer first"
        seed, sim, wav, _ = autotune_search(
            self.synthesizer, utt.embed, text, n_seeds=n_seeds,
            start_seed=start_seed,
        )
        return seed, sim, wav
