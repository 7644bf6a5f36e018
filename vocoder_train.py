"""Train a WaveRNN vocoder (ref: vocoder_train.py)."""
import argparse
from pathlib import Path

from rtvc_tpu.config import synthesizer_paths
from rtvc_tpu.data.vocoder_dataset import VocoderDataset, batch_iterator
from rtvc_tpu.models import factories
from rtvc_tpu.train.trainer import train_vocoder

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("run_id", type=str)
    parser.add_argument(
        "model_type", type=str, nargs="?",
        default=factories.MODEL_TYPE_FATCHORD,
        choices=list(factories.VOC_MODEL_TYPES),
    )
    parser.add_argument("datasets_root", type=Path)
    parser.add_argument("--syn_dir", type=Path, default=None)
    parser.add_argument("--voc_dir", type=Path, default=None)
    parser.add_argument("-m", "--models_dir", type=Path, default=Path("saved_models"))
    parser.add_argument("-g", "--ground_truth", action="store_true",
                        help="Train on ground-truth mels instead of GTA mels.")
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

    syn_dir = args.syn_dir or args.datasets_root / "SV2TTS" / "synthesizer"
    voc_dir = args.voc_dir or args.datasets_root / "SV2TTS" / "vocoder"

    cfg = factories.init_voc_model(args.model_type).config
    if args.ground_truth:
        metadata = syn_dir / synthesizer_paths.metadata_file
        mel_dir = syn_dir / synthesizer_paths.mel_dir
    else:
        metadata = voc_dir / synthesizer_paths.gta_metadata_file
        mel_dir = voc_dir / synthesizer_paths.gta_mel_dir
    wav_dir = syn_dir / synthesizer_paths.wav_dir

    dataset = VocoderDataset(metadata, mel_dir, wav_dir, cfg)
    print(dataset.get_logs())

    import jax

    def epoch_batches(session_idx):
        batch_size = int(cfg.voc_tts_schedule[session_idx][3])
        return batch_iterator(dataset, batch_size, cfg, seed=session_idx,
                              process_index=jax.process_index(),
                              process_count=jax.process_count())

    # Checkpoint-time sample generation (ref: vocoder/train.py:269-271)
    from rtvc_tpu.models import factories as _f
    from rtvc_tpu.train.gen_testset import gen_testset

    sample_dir = args.models_dir / args.run_id / "samples"
    dims = _f.init_voc_model(args.model_type).dims

    def gen_hook(step, variables):
        gen_testset(variables, dims, cfg, dataset, sample_dir, step,
                    samples=cfg.gen_at_checkpoint)

    train_vocoder(
        args.run_id, args.model_type, args.models_dir, epoch_batches,
        save_every=args.save_every, backup_every=args.backup_every,
        max_steps=args.max_steps,
        resume=not args.force_restart, gen_hook=gen_hook,
        gen_every=args.save_every,
        dp_mesh=dp_mesh,
        compute_dtype=args.compute_dtype,
    )
