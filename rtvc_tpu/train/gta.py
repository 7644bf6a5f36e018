"""Ground-truth-aligned (GTA) synthesis for vocoder training.

Runs the trained synthesizer teacher-forced over the whole dataset and saves
the predicted mels + ``synthesized.json`` metadata (ref:
synthesizer/synthesize.py:21-152; dropout forced off per :44-56). The vocoder
then trains on these mels so it learns to fix the synthesizer's artifacts.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.config import synthesizer_paths
from rtvc_tpu.models import factories


def run_synthesis(
    syn_dir: Path,
    voc_dir: Path,
    bundle: factories.SynModel,
    r: int = 1,
    batch_size: int = 8,
    skip_existing: bool = False,
) -> int:
    """Teacher-forced synthesis over the dataset → ``mels_gta/*.npy`` +
    ``synthesized.json``. Returns the number of synthesized utterances."""
    from rtvc_tpu.data.synthesizer_dataset import SynthesizerDataset, batch_iterator

    syn_dir, voc_dir = Path(syn_dir), Path(voc_dir)
    gta_dir = voc_dir / synthesizer_paths.gta_mel_dir
    gta_dir.mkdir(parents=True, exist_ok=True)
    meta_out = voc_dir / synthesizer_paths.gta_metadata_file

    elements = factories.get_model_train_elements(bundle.model_type)
    dataset = SynthesizerDataset(syn_dir, elements)
    d = bundle.dims

    existing = (
        {p.stem for p in gta_dir.glob("*.npy")} if skip_existing else set()
    )

    # The reference saves the POSTNET output as the GTA mel
    # (ref: synthesizer/synthesize.py:111,129 — second forward output).
    if bundle.model_type == factories.MODEL_TYPE_TACOTRON:
        from rtvc_tpu.models.tacotron import tacotron_forward

        # The reference zeroes hp.dropout for GTA so the saved mels are
        # deterministic (ref: synthesizer/synthesize.py:44-48); dims are a
        # static NamedTuple, so the same override is one _replace. The
        # always-on prenet dropout (Tacotron-2 convention) stays active for
        # regular inference — GTA is the one documented exception.
        d_gta = d._replace(dropout=0.0)

        @jax.jit
        def forward(variables, batch, rng):
            _, m2, _, _, _ = tacotron_forward(
                variables, d_gta, batch["chars"], batch["mels"],
                batch["embeds"], r, rng, train=False,
            )
            return m2

    else:
        if bundle.model_type == factories.MODEL_TYPE_FORWARD_TACOTRON:
            from rtvc_tpu.models.forward_tacotron import (
                forward_tacotron_forward as nar_fwd,
            )
        else:
            from rtvc_tpu.models.fast_pitch import fastpitch_forward as nar_fwd

        @jax.jit
        def forward(variables, batch, rng):
            _, m2, _, _, _, _ = nar_fwd(
                variables, d, batch["chars"], batch["mels"],
                batch["durations"], batch["embeds"], batch["spec_lens"],
                batch["phoneme_pitchs"], batch["phoneme_energys"],
                rng, train=False,
            )
            return m2

    metadata = {}
    if skip_existing and meta_out.exists():
        metadata = json.loads(meta_out.read_text())

    # utterance id → original train.json line
    src_lines = {
        l.split("|")[0]: l
        for lines in json.loads(
            (syn_dir / synthesizer_paths.metadata_file).read_text()
        ).values()
        for l in lines
    }

    # Multi-process sharding: batch k belongs to process (k mod P); each
    # process writes a partial JSON, the main process merges after the
    # barrier (the reference's per-process result merge,
    # ref: synthesizer/synthesize.py:154-196).
    pidx, pcount = jax.process_index(), jax.process_count()

    count = 0
    rng = jax.random.PRNGKey(0)
    for k, batch in enumerate(batch_iterator(
        dataset, batch_size, r, shuffle=False, drop_last=False, mel_bucket=2
    )):
        if k % pcount != pidx:
            continue
        ids = [dataset.samples_fnames[i] for i in batch["indices"]]
        if skip_existing and all(u in existing for u in ids):
            continue
        jbatch = {
            k2: jnp.asarray(v)
            for k2, v in batch.items()
            if k2 in ("chars", "mels", "embeds", "durations", "spec_lens",
                      "phoneme_pitchs", "phoneme_energys")
        }
        mels_out = np.asarray(forward(bundle.variables, jbatch, rng))
        for b, utt_id in enumerate(ids):
            n = int(batch["spec_lens"][b])
            np.save(gta_dir / f"{utt_id}.npy", mels_out[b, :, :n].T,
                    allow_pickle=False)
            # metadata line mirrors train.json's "id|n_samples|n_frames|text"
            metadata[utt_id] = src_lines.get(utt_id, f"{utt_id}|{n * 200}|{n}|")
            count += 1

    if pcount == 1:
        meta_out.write_text(json.dumps(metadata))
    else:
        part = voc_dir / f"synthesized.part{pidx}.json"
        part.write_text(json.dumps(metadata))
        from rtvc_tpu.parallel.mesh import is_main_process, wait_for_everyone

        wait_for_everyone()  # every part file on the shared FS
        if is_main_process():
            merged = {}
            for p in range(pcount):
                merged.update(json.loads(
                    (voc_dir / f"synthesized.part{p}.json").read_text()
                ))
            meta_out.write_text(json.dumps(merged))
        wait_for_everyone()  # nobody reads synthesized.json before merge
    print("GTA synthesis wrote %d mels to %s" % (count, gta_dir))
    return count
