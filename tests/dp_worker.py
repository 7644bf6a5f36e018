"""Worker process for the 2-process data-parallel equivalence test.

Launched by tests/test_distributed.py as

    python tests/dp_worker.py <process_id> <num_processes> <port> <outdir>

Connects to the localhost coordinator, then:
  * runs 3 steps of the FULL encoder trainer (``train_encoder`` with
    ``dp_mesh``) on deterministic synthetic GE2E batches — this process
    contributes its local shard of every global batch; the global similarity
    matrix is computed across both processes (collectives over gloo);
  * runs 2 raw Tacotron DP train steps on a globally-sharded batch;
  * dumps the final parameters for the parent to compare against a
    single-process run, and relies on CheckpointCadence's main-process
    gating so only process 0's models_dir gains a checkpoint.

The reference bar this proves: Accelerate multi-process DDP training
(ref: encoder/train.py:16,79-110; synthesizer/train.py:78).
"""
import pickle
import sys
from pathlib import Path

import numpy as np


def enc_global_batch(step: int, S: int, U: int, T: int, n_mels: int):
    rng = np.random.default_rng(1000 + step)
    return rng.standard_normal((S * U, T, n_mels)).astype(np.float32)


def taco_global_batch(d, B: int, T_text: int, steps: int):
    rng = np.random.default_rng(7)
    return {
        "chars": rng.integers(1, d.num_chars, (B, T_text)).astype(np.int32),
        "mels": rng.standard_normal((B, d.n_mels, steps)).astype(np.float32),
        "embeds": rng.standard_normal((B, d.speaker_embedding_size)).astype(
            np.float32
        ),
        "stop": np.ones((B, steps), np.float32),
    }


# Tiny-but-nontrivial shapes shared by worker and single-process oracle
ENC = dict(S=4, U=3, T=12, n_mels=10)
ENC_STEPS = 3
TACO_STEPS = 2
TACO_B, TACO_TTEXT, TACO_R = 4, 12, 2


def tiny_encoder_model():
    from rtvc_tpu.config.encoder import EncoderDataParams, EncoderModelParams
    from rtvc_tpu.models.speaker_encoder import SpeakerEncoder

    return SpeakerEncoder(
        model=EncoderModelParams(
            model_hidden_size=16, model_embedding_size=16, model_num_layers=2
        ),
        data=EncoderDataParams(),
    )


def tiny_taco_cfg():
    from rtvc_tpu.config.synthesizer import TacotronParams

    return TacotronParams(
        embed_dims=8, encoder_dims=4, decoder_dims=8, postnet_dims=4,
        encoder_K=2, lstm_dims=8, postnet_K=2, num_highways=1,
    )


def run_encoder_training(models_dir: Path, dp_mesh, local_slice=None):
    """The same trainer invocation the entry script makes; ``local_slice``
    selects this process's rows of each global batch (None = whole batch)."""
    from rtvc_tpu.train.trainer import train_encoder

    def batches():
        step = 0
        while True:
            b = enc_global_batch(step, **ENC)
            yield b if local_slice is None else b[local_slice]
            step += 1

    return train_encoder(
        "dprun", batches(), models_dir,
        speakers_per_batch=ENC["S"], utterances_per_speaker=ENC["U"],
        learning_rate=1e-3, total_steps=ENC_STEPS, save_every=1,
        backup_every=0, eer_every=1, resume=False,
        model=tiny_encoder_model(), dp_mesh=dp_mesh,
    )


def run_taco_steps(dp_mesh, local_slice=None):
    import jax
    import jax.numpy as jnp
    import optax

    from rtvc_tpu.models import factories
    from rtvc_tpu.train.steps import make_tacotron_train_step

    bundle = factories.init_syn_model(
        factories.MODEL_TYPE_TACOTRON, seed=0, override_hp=tiny_taco_cfg()
    )
    d = bundle.dims
    optimizer = optax.adam(1e-3)
    step_fn = make_tacotron_train_step(d, optimizer, r=TACO_R,
                                       clip_grad_norm=1.0)
    gbatch = taco_global_batch(d, TACO_B, TACO_TTEXT, 4 * TACO_R)

    params = bundle.variables["params"]
    stats = bundle.variables["batch_stats"]
    opt_state = optimizer.init(params)
    if dp_mesh is not None:
        from rtvc_tpu.parallel import distributed as dist

        params = dist.replicate_global(params, dp_mesh)
        stats = dist.replicate_global(stats, dp_mesh)
        opt_state = dist.replicate_global(opt_state, dp_mesh)
        batch = dist.global_batch(
            {k: v[local_slice] for k, v in gbatch.items()}, dp_mesh
        )
    else:
        batch = {k: jnp.asarray(v) for k, v in gbatch.items()}

    losses = []
    for i in range(TACO_STEPS):
        params, stats, opt_state, metrics, _ = step_fn(
            params, stats, opt_state, batch, jax.random.PRNGKey(5 + i)
        )
        losses.append(float(metrics["loss"]))
    return params, losses


def dump_tree(path: Path, tree):
    import jax

    np_tree = jax.tree_util.tree_map(np.asarray, tree)
    with open(path, "wb") as f:
        pickle.dump(np_tree, f)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = Path(sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    from rtvc_tpu.parallel import distributed as dist

    dist.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    from rtvc_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    n_dev = len(jax.devices())
    local = ENC["S"] * ENC["U"] // nproc
    enc_slice = slice(pid * local, (pid + 1) * local)

    result = run_encoder_training(outdir / f"proc{pid}", mesh, enc_slice)
    dump_tree(outdir / f"enc_params_{pid}.pkl", result["params"])

    t_local = TACO_B // nproc
    taco_params, losses = run_taco_steps(
        mesh, slice(pid * t_local, (pid + 1) * t_local)
    )
    dump_tree(outdir / f"taco_params_{pid}.pkl", taco_params)
    (outdir / f"done_{pid}").write_text(
        f"devices={n_dev} losses={losses}\n"
    )
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
