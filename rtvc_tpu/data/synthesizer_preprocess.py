"""Synthesizer dataset preprocessing (ref: synthesizer/preprocess.py).

Three passes, same on-disk contracts:
  1. audio — speaker dirs → trimmed wavs + mels (+ ``train.json`` keyed by
     speaker dir with "utt_id|n_samples|n_frames|text" lines, crash-safe via
     atexit) (:43-154, 237-281);
  2. embeddings — encoder inference over saved wavs → ``embeds/embed-*.npy``
     (:284-323);
  3. alignment features — Tacotron attention → durations (DP monotonic
     path), F0 + mel energy per phoneme → 5 artifact dirs (:325-472).

Alignment-based silence splitting with logmmse denoising (:157-234) is kept
for corpora that ship word alignments.
"""
from __future__ import annotations

import atexit
import json
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from shutil import copyfile
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from rtvc_tpu.config import preprocessing, sp, synthesizer_paths
from rtvc_tpu.ops import logmmse
from rtvc_tpu.ops.pitch import estimate_f0
from rtvc_tpu.text import text_to_sequence
from rtvc_tpu.utils.io import load_wav


def _save_metadata(metadata: Dict, fpath: Path) -> None:
    with Path(fpath).open("w", encoding="utf-8") as f:
        json.dump(metadata, f)


# ---------------------------------------------------------------------------
# Pass 1: audio
# ---------------------------------------------------------------------------


def process_utterance(
    utterance_id: str, wav: np.ndarray, text: str, out_dir: Path
) -> Optional[Tuple[str, int, int, str]]:
    """Trim → mel → save mel/wav npy (ref: synthesizer/preprocess.py:237-281).
    Returns (utterance_id, n_samples, n_frames, text) or None if dropped."""
    import jax.numpy as jnp

    from rtvc_tpu.inference import encoder as enc
    from rtvc_tpu.ops.audio import melspectrogram
    from rtvc_tpu.ops.vad import trim_silence

    if preprocessing.trim_silence:
        wav = enc.preprocess_wav(wav, normalize=False, trim_silence=True)
    if preprocessing.trim_start_end_silence:
        wav = trim_silence(wav, preprocessing.trim_silence_top_db)

    if len(wav) < preprocessing.utterance_min_duration * sp.sample_rate:
        return None

    mel = np.asarray(melspectrogram(jnp.asarray(wav), sp, preprocessing),
                     dtype=np.float32)
    mel_frames = mel.shape[1]
    if mel_frames > preprocessing.max_mel_frames and preprocessing.clip_mels_length:
        return None

    out_dir = Path(out_dir)
    np.save(out_dir / synthesizer_paths.mel_dir / ("mel-%s.npy" % utterance_id),
            mel.T, allow_pickle=False)
    np.save(out_dir / synthesizer_paths.wav_dir / ("audio-%s.npy" % utterance_id),
            wav, allow_pickle=False)
    return utterance_id, len(wav), mel_frames, text


def preprocess_speaker(
    speaker_dir: Path,
    out_dir: Path,
    audio_extensions: Sequence[str],
    transcript_extension: str,
) -> Dict:
    """One speaker directory → per-utterance artifacts + metadata lines
    (ref: synthesizer/preprocess.py:106-154)."""
    speaker_dir = Path(speaker_dir)
    result = {"speaker_dir": str(speaker_dir), "metadata": []}
    for ext in audio_extensions:
        for wav_fpath in sorted(speaker_dir.glob("**/*%s" % ext)):
            utterance_id = "%s_%s" % (speaker_dir.name, wav_fpath.stem)
            try:
                wav, _ = load_wav(wav_fpath, target_sr=sp.sample_rate)
            except Exception as e:
                print("Unable to load audio file %s: %r" % (wav_fpath, e))
                continue
            if preprocessing.rescale:
                wav = wav / np.abs(wav).max() * preprocessing.rescaling_max

            text_fpath = wav_fpath.with_suffix(transcript_extension)
            if not text_fpath.exists():
                continue
            text = text_fpath.read_text().strip()
            if len(text) < preprocessing.min_text_len:
                continue

            output = process_utterance(utterance_id, wav, text, out_dir)
            if output is not None:
                result["metadata"].append(output)
    return result


def synthesizer_preprocess_dataset(
    datasets_root: Path,
    out_dir: Path,
    dataset_name: str,
    subfolders: Sequence[str],
    audio_extensions: Sequence[str],
    transcript_extension: str,
    n_processes: int = 4,
    skip_existing: bool = False,
) -> None:
    """Audio pass over a corpus (ref: synthesizer/preprocess.py:43-103)."""
    dataset_root = Path(datasets_root) / dataset_name
    input_dirs = [dataset_root / sub.strip() for sub in subfolders]
    input_dirs = [d for d in input_dirs if d.exists()]
    assert input_dirs, "No input directories found under %s" % dataset_root

    out_dir = Path(out_dir)
    (out_dir / synthesizer_paths.mel_dir).mkdir(parents=True, exist_ok=True)
    (out_dir / synthesizer_paths.wav_dir).mkdir(parents=True, exist_ok=True)
    metadata_fpath = out_dir / synthesizer_paths.metadata_file

    metadata: Dict[str, List[str]] = {}
    if metadata_fpath.is_file():
        if skip_existing:
            metadata = json.loads(metadata_fpath.read_text())
        else:
            copyfile(metadata_fpath,
                     out_dir / ("train_backup_%f.json" % time.time()))

    speaker_dirs = [
        d for input_dir in input_dirs for d in sorted(input_dir.glob("*")) if d.is_dir()
    ]
    if skip_existing:
        speaker_dirs = [d for d in speaker_dirs if str(d) not in metadata]

    # Crash-safe progress persistence (ref: :74, SURVEY.md §5.3)
    atexit.register(_save_metadata, metadata, metadata_fpath)

    with ThreadPoolExecutor(max_workers=n_processes) as pool:
        for speaker_metadata in pool.map(
            lambda d: preprocess_speaker(
                d, out_dir, audio_extensions, transcript_extension
            ),
            speaker_dirs,
        ):
            metadata[speaker_metadata["speaker_dir"]] = [
                "|".join(str(x) for x in m) for m in speaker_metadata["metadata"]
            ]

    _save_metadata(metadata, metadata_fpath)
    atexit.unregister(_save_metadata)

    # Corpus summary (ref: :90-103)
    lines = [line.split("|") for utts in metadata.values() for line in utts]
    if lines:
        mel_frames = sum(int(m[2]) for m in lines)
        timesteps = sum(int(m[1]) for m in lines)
        hours = timesteps / sp.sample_rate / 3600
        print(
            "The dataset consists of %d utterances, %d mel frames, %d audio "
            "timesteps (%.2f hours)." % (len(lines), mel_frames, timesteps, hours)
        )
        print("Max input length (text chars): %d" % max(len(m[3]) for m in lines))
        print("Max mel frames length: %d" % max(int(m[2]) for m in lines))
        print("Max audio timesteps length: %d" % max(int(m[1]) for m in lines))


# ---------------------------------------------------------------------------
# Silence-based utterance splitting (alignment-aware corpora)
# ---------------------------------------------------------------------------


def split_on_silences(
    wav_fpath: Path,
    words: Sequence[str],
    end_times: Sequence[float],
    transcript: Optional[str] = None,
) -> Tuple[List[np.ndarray], List[str]]:
    """Split a long utterance at aligned silences ≥
    ``silence_min_duration_split``, with logmmse noise profiling on the
    silent stretches (ref: synthesizer/preprocess.py:157-234)."""
    wav, _ = load_wav(wav_fpath, target_sr=sp.sample_rate)
    if preprocessing.rescale:
        wav = wav / np.abs(wav).max() * preprocessing.rescaling_max

    words = np.asarray(words)
    start_times = np.asarray([0.0] + list(end_times[:-1]))
    end_times = np.asarray(end_times)
    assert len(words) == len(end_times) == len(start_times)

    if words[0] != "" and words[-1] != "":
        text = transcript if transcript is not None else " ".join(words).replace("  ", " ")
        return [wav], [text]

    mask = (words == "") & (
        end_times - start_times >= preprocessing.silence_min_duration_split
    )
    mask[0] = mask[-1] = True
    breaks = np.where(mask)[0]

    # Noise-reduce using the silence stretches as the noise profile
    silence_times = np.asarray(
        [[start_times[i], end_times[i]] for i in breaks]
    )
    silence_samples = (silence_times * sp.sample_rate).astype(np.int64)
    noisy = np.concatenate([wav[s:e] for s, e in silence_samples]) if len(
        silence_samples
    ) else np.zeros(0)
    if len(noisy) > sp.sample_rate * 0.02:
        profile = logmmse.profile_noise(noisy, sp.sample_rate)
        wav = logmmse.denoise(wav, profile, eta=0)

    # Merge segments that are too short into their shortest neighbor
    segments = list(zip(breaks[:-1], breaks[1:]))
    seg_durations = [start_times[e] - end_times[s] for s, e in segments]
    i = 0
    max_dur = sp.hop_size * preprocessing.max_mel_frames / sp.sample_rate
    while i < len(segments) and len(segments) > 1:
        if seg_durations[i] < preprocessing.utterance_min_duration:
            left = float("inf") if i == 0 else seg_durations[i - 1]
            right = float("inf") if i == len(segments) - 1 else seg_durations[i + 1]
            joined = seg_durations[i] + min(left, right)
            if joined > max_dur:
                i += 1
                continue
            j = i - 1 if left <= right else i
            segments[j] = (segments[j][0], segments[j + 1][1])
            seg_durations[j] = joined
            del segments[j + 1], seg_durations[j + 1]
        else:
            i += 1

    seg_times = (
        np.asarray([[end_times[s], start_times[e]] for s, e in segments])
        * sp.sample_rate
    ).astype(np.int64)
    wavs = [wav[s:e] for s, e in seg_times]
    texts = [" ".join(words[s + 1 : e]).replace("  ", " ") for s, e in segments]
    return wavs, texts


# ---------------------------------------------------------------------------
# Pass 2: embeddings
# ---------------------------------------------------------------------------


def create_embeddings(
    synthesizer_root: Path,
    encoder_model_fpath: Path,
    skip_existing: bool = False,
    n_processes: int = 4,
) -> None:
    """Encoder embeddings for every utterance (ref:
    synthesizer/preprocess.py:284-323)."""
    from rtvc_tpu.inference import encoder as enc

    synthesizer_root = Path(synthesizer_root)
    wav_dir = synthesizer_root / synthesizer_paths.wav_dir
    metadata_fpath = synthesizer_root / synthesizer_paths.metadata_file
    assert wav_dir.exists() and metadata_fpath.exists()
    embed_dir = synthesizer_root / synthesizer_paths.embed_dir
    embed_dir.mkdir(exist_ok=True)

    metadata = json.loads(metadata_fpath.read_text())
    utterance_ids = [
        line.split("|")[0] for lines in metadata.values() for line in lines
    ]
    if skip_existing:
        existing = {p.name for p in embed_dir.glob("embed-*.npy")}
        utterance_ids = [
            u for u in utterance_ids if ("embed-%s.npy" % u) not in existing
        ]

    if not enc.is_loaded():
        if encoder_model_fpath is not None and Path(encoder_model_fpath).exists():
            enc.load_model(encoder_model_fpath)
        else:
            raise RuntimeError("Encoder model not loaded and no weights found")

    def embed_one(utterance_id: str):
        wav = np.load(wav_dir / ("audio-%s.npy" % utterance_id))
        wav = enc.preprocess_wav(wav)
        embed = enc.embed_utterance(wav)
        np.save(embed_dir / ("embed-%s.npy" % utterance_id), embed,
                allow_pickle=False)

    # Embedding forward passes share the single device — thread pool only
    # hides the file IO.
    with ThreadPoolExecutor(max_workers=n_processes) as pool:
        list(pool.map(embed_one, utterance_ids))
    print("Embedded %d utterances." % len(utterance_ids))


# ---------------------------------------------------------------------------
# Pass 3: alignment features (durations / pitch / energy)
# ---------------------------------------------------------------------------


def create_align_features(
    synthesizer_root: Path,
    synthesizer_model_fpath: Path,
    skip_existing: bool = False,
    batch_hook=None,
) -> None:
    """Tacotron-attention durations + F0 + energy per phoneme
    (ref: synthesizer/preprocess.py:325-472). ``batch_hook`` may inject a
    preloaded synthesizer (tests / in-memory models)."""
    from rtvc_tpu.data.duration_extractor import DurationExtractor, attention_scores
    from rtvc_tpu.inference.attention import TacotronAligner

    synthesizer_root = Path(synthesizer_root)
    paths = synthesizer_paths
    for d in (paths.duration_dir, paths.attention_dir, paths.alignment_dir,
              paths.phoneme_pitch_dir, paths.phoneme_energy_dir):
        (synthesizer_root / d).mkdir(exist_ok=True)

    metadata = json.loads(
        (synthesizer_root / paths.metadata_file).read_text()
    )
    utterances = [
        (m[0], m[3].strip())
        for lines in metadata.values()
        for m in (line.split("|") for line in lines)
        if int(m[2])
    ]
    if skip_existing:
        existing = {
            p.name
            for p in (synthesizer_root / paths.phoneme_energy_dir).glob(
                "phoneme-energy-*.npy"
            )
        }
        utterances = [
            (u, t)
            for u, t in utterances
            if ("phoneme-energy-%s.npy" % u) not in existing
        ]

    # Multi-process: shard the utterance list by process index — the same
    # split the reference does for this pass
    # (ref: synthesizer/preprocess.py:459-465).
    import jax as _jax

    if _jax.process_count() > 1:
        utterances = utterances[_jax.process_index()::_jax.process_count()]

    aligner = batch_hook or TacotronAligner(synthesizer_model_fpath)
    extractor = DurationExtractor(
        silence_threshold=preprocessing.silence_threshold,
        silence_prob_shift=preprocessing.silence_prob_shift,
    )

    for utterance_id, text in utterances:
        wav = np.load(
            synthesizer_root / paths.wav_dir / ("audio-%s.npy" % utterance_id)
        )
        mel = np.load(
            synthesizer_root / paths.mel_dir / ("mel-%s.npy" % utterance_id)
        ).T.astype(np.float32)
        embed = np.load(
            synthesizer_root / paths.embed_dir / ("embed-%s.npy" % utterance_id)
        )

        tokens = np.asarray(
            text_to_sequence(text, preprocessing.cleaner_names), dtype=np.int32
        )
        mel_len = mel.shape[-1]

        att = aligner.attention(tokens, mel, embed)  # (T_mel, T_text)
        align_score, _ = attention_scores(att[None], np.asarray([mel_len]))
        align_score = float(align_score[0])

        f0 = estimate_f0(
            wav.astype(np.float64), sp.sample_rate, sp.hop_size
        ).astype(np.float32)

        duration, att_score = extractor(tokens, mel, att[:mel_len])
        duration = duration.astype(np.int64)
        if duration.sum() != mel_len:
            print(
                "WARNING: Sum of durations did not match mel length for item %s!"
                % utterance_id
            )

        energy = np.linalg.norm(np.exp(mel), axis=0, ord=2)

        # Per-phoneme averaging of frame-level pitch/energy (ref: :389-398)
        durs_cum = np.cumsum(np.pad(duration, (1, 0)))
        pitch_char = np.zeros(duration.shape[0], dtype=np.float32)
        energy_char = np.zeros(duration.shape[0], dtype=np.float32)
        for idx, (a, b) in enumerate(zip(durs_cum[:-1], durs_cum[1:])):
            values = f0[a:b][f0[a:b] != 0.0]
            values = values[values < preprocessing.pitch_max_freq]
            pitch_char[idx] = float(np.mean(values)) if len(values) else 0.0
            seg = energy[a:b]
            energy_char[idx] = float(np.mean(seg)) if len(seg) else 0.0

        root = synthesizer_root
        np.save(root / paths.duration_dir / f"duration-{utterance_id}.npy",
                duration, allow_pickle=False)
        np.save(root / paths.attention_dir / f"attention-{utterance_id}.npy",
                np.float32(att_score), allow_pickle=False)
        np.save(root / paths.alignment_dir / f"alignment-{utterance_id}.npy",
                np.float32(align_score), allow_pickle=False)
        np.save(root / paths.phoneme_pitch_dir / f"phoneme-pitch-{utterance_id}.npy",
                pitch_char, allow_pickle=False)
        np.save(root / paths.phoneme_energy_dir / f"phoneme-energy-{utterance_id}.npy",
                energy_char, allow_pickle=False)
    print("Aligned %d utterances." % len(utterances))
