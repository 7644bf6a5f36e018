"""Train a synthesizer (tacotron / forward-tacotron / fast-pitch)
(ref: synthesizer_train.py)."""
import argparse
from pathlib import Path

from rtvc_tpu.data.synthesizer_dataset import SynthesizerDataset, batch_iterator
from rtvc_tpu.models import factories
from rtvc_tpu.train.trainer import train_synthesizer

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("run_id", type=str)
    parser.add_argument(
        "model_type", type=str, nargs="?", default=factories.MODEL_TYPE_TACOTRON,
        choices=list(factories.SYN_MODEL_TYPES),
    )
    parser.add_argument("syn_dir", type=Path)
    parser.add_argument("-m", "--models_dir", type=Path, default=Path("saved_models"))
    parser.add_argument("-s", "--save_every", type=int, default=1000)
    parser.add_argument("-b", "--backup_every", type=int, default=25000)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--compute_dtype",
                        choices=["auto", "f32", "bf16"], default="auto",
                        help="auto = bf16 on TPU (measured 1.2-1.6x "
                             "steps/s, <5%% loss-trajectory deviation; "
                             "BENCHMARKS.md), f32 elsewhere. Master "
                             "params always stay f32.")
    parser.add_argument("-f", "--force_restart", action="store_true",
                        help="Ignore any saved model for this run_id and "
                             "restart from scratch.")
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

    elements = factories.get_model_train_elements(args.model_type)
    dataset = SynthesizerDataset(args.syn_dir, elements)
    print(dataset.get_logs())

    # Per-session batch size comes from the schedule; the iterator factory
    # rebuilds loaders per session like the reference
    # (ref: synthesizer/train.py:172-180).
    bundle_cfg = factories.init_syn_model(args.model_type).config

    import jax

    def epoch_batches(session_idx, r):
        schedule = bundle_cfg.tts_schedule[session_idx]
        batch_size = schedule[2] if args.model_type == "tacotron" else schedule[1]
        return batch_iterator(
            dataset, batch_size=batch_size, r=r, seed=session_idx,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )

    if args.model_type == factories.MODEL_TYPE_TACOTRON:
        from rtvc_tpu.train.eval_hooks import make_tacotron_eval_hook

        eval_hook = make_tacotron_eval_hook(
            args.models_dir / args.run_id / "samples"
        )
    else:
        from rtvc_tpu.train.eval_hooks import make_nar_eval_hook

        eval_hook = make_nar_eval_hook(
            args.models_dir / args.run_id / "samples", args.model_type
        )

    train_synthesizer(
        args.run_id, args.model_type, args.syn_dir, args.models_dir,
        epoch_batches, save_every=args.save_every,
        backup_every=args.backup_every, max_steps=args.max_steps,
        resume=not args.force_restart,
        eval_hook=eval_hook,
        eval_interval=bundle_cfg.eval_interval,
        dp_mesh=dp_mesh,
        compute_dtype=args.compute_dtype,
    )
