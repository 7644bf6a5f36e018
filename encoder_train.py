"""Train the GE2E speaker encoder (ref: encoder_train.py)."""
import argparse
from pathlib import Path

from rtvc_tpu.config.encoder import encoder_model
from rtvc_tpu.data.ge2e_sampler import (
    SpeakerVerificationDataset,
    speaker_batch_iterator,
)
from rtvc_tpu.train.trainer import train_encoder

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("run_id", type=str)
    parser.add_argument("clean_data_root", type=Path,
                        help="Preprocessed encoder dataset root.")
    parser.add_argument("-m", "--models_dir", type=Path, default=Path("saved_models"))
    parser.add_argument("--save_every", type=int, default=500)
    parser.add_argument("--backup_every", type=int, default=7500)
    parser.add_argument("--total_steps", type=int, default=None)
    parser.add_argument("-e", "--end_after", type=int, default=None,
                        help="Stop after this many additional steps "
                             "(relative; ref encoder_train.py --end_after).")
    parser.add_argument("--learning_rate", type=float,
                        default=encoder_model.learning_rate_init)
    parser.add_argument("--speakers_per_batch", type=int,
                        default=encoder_model.speakers_per_batch)
    parser.add_argument("--utterances_per_speaker", type=int,
                        default=encoder_model.utterances_per_speaker)
    parser.add_argument("-f", "--force_restart", action="store_true",
                        help="Ignore any saved model for this run_id and "
                             "restart from scratch.")
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--compute_dtype",
                        choices=["auto", "f32", "bf16"], default="auto",
                        help="auto = bf16 on TPU (measured 1.2-1.6x "
                             "steps/s, <5%% loss-trajectory deviation; "
                             "BENCHMARKS.md), f32 elsewhere. Master "
                             "params always stay f32.")
    parser.add_argument("--dashboard", type=int, default=None, metavar="PORT",
                        help="Serve a live metrics dashboard on this port "
                             "(visdom replacement; 8097 = visdom default)")
    from rtvc_tpu.parallel import distributed as dist

    dist.add_launch_args(parser)
    args = parser.parse_args()
    dp_mesh = dist.setup_from_args(args)

    if args.dashboard is not None:
        from rtvc_tpu.utils.dashboard import serve as _serve_dashboard

        _serve_dashboard(args.models_dir / args.run_id, port=args.dashboard,
                         background=True)
        print(f"Dashboard: http://localhost:{args.dashboard}")

    import jax

    # Multi-process DP: the speaker LIST is sharded disjointly per process
    # (no same-speaker collisions inside one global GE2E batch) and each
    # process samples its local slice of every batch (the Accelerate
    # per-rank-loader equivalent, ref: encoder/train.py:79).
    nproc = jax.process_count()
    if args.speakers_per_batch % nproc:
        raise SystemExit(
            f"speakers_per_batch={args.speakers_per_batch} must divide by "
            f"the number of processes ({nproc})"
        )
    dataset = SpeakerVerificationDataset(
        args.clean_data_root,
        process_index=jax.process_index(), process_count=nproc,
    )
    it = speaker_batch_iterator(
        dataset, args.speakers_per_batch // nproc, args.utterances_per_speaker,
        n_frames=160,
        seed=None if nproc == 1 else 1234 + jax.process_index(),
    )
    train_encoder(
        args.run_id, it, args.models_dir,
        speakers_per_batch=args.speakers_per_batch,
        utterances_per_speaker=args.utterances_per_speaker,
        learning_rate=args.learning_rate, total_steps=args.total_steps,
        end_after=args.end_after,
        save_every=args.save_every, backup_every=args.backup_every,
        profile=args.profile, resume=not args.force_restart,
        dp_mesh=dp_mesh,
        compute_dtype=args.compute_dtype,
    )
