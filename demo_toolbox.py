"""Toolbox CLI (ref: demo_toolbox.py — Qt GUI replaced by subcommands; all
capabilities preserved: browse, embed visualization + projection, clone,
backend toggle, autotune)."""
import argparse
from pathlib import Path

from rtvc_tpu import toolbox as tb


def _load_models(args, box: tb.Toolbox, need_synthesis: bool = True):
    """Load the models a command actually needs: embed/project only use the
    encoder; clone/autotune need the full triplet."""
    from rtvc_tpu.inference import encoder, synthesizer, vocoder

    if args.enc_model_fpath.exists():
        encoder.load_model(args.enc_model_fpath)
        if need_synthesis:
            synth = synthesizer.Synthesizer(args.syn_model_fpath, verbose=False)
            synth.load()
            vocoder.load_model(args.voc_model_fpath, voc_type=args.vocoder_backend)
            box.synthesizer = synth
    else:
        print("No trained models found — using random weights.")
        import demo_cli

        box.synthesizer = demo_cli.build_models_for_selftest()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-d", "--datasets_root", type=Path, default=None)
    parser.add_argument("-o", "--out_dir", type=Path, default=Path("toolbox_out"))
    parser.add_argument("-e", "--enc_model_fpath", type=Path,
                        default=Path("saved_models/default/encoder.ckpt"))
    parser.add_argument("-s", "--syn_model_fpath", type=Path,
                        default=Path("saved_models/default/synthesizer.ckpt"))
    parser.add_argument("-v", "--voc_model_fpath", type=Path,
                        default=Path("saved_models/default/vocoder.ckpt"))
    parser.add_argument("--vocoder_backend", type=str, default="pytorch",
                        choices=["pytorch", "libwavernn"],
                        help="JAX path ('pytorch' compat name) or native engine.")
    parser.add_argument("--cpu", action="store_true", help="Run on CPU.")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("browse", help="List dataset audio files.")
    p.add_argument("--max", type=int, default=20)

    p = sub.add_parser("embed", help="Embed an utterance; save heatmap.")
    p.add_argument("wav", type=Path)

    p = sub.add_parser("project", help="PCA projection of several utterances.")
    p.add_argument("wavs", type=Path, nargs="+")

    p = sub.add_parser("clone", help="Clone a voice onto a text.")
    p.add_argument("wav", type=Path)
    p.add_argument("text", type=str)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("autotune", help="Seed search for best voice match.")
    p.add_argument("wav", type=Path)
    p.add_argument("text", type=str)
    p.add_argument("--n_seeds", type=int, default=10)

    p = sub.add_parser(
        "tui", help="Interactive full-screen terminal toolbox (curses)."
    )

    p = sub.add_parser(
        "web", help="Browser toolbox (serve.py GET / — rtvc_tpu/webui.py)."
    )
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)

    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    box = tb.Toolbox(datasets_root=args.datasets_root, out_dir=args.out_dir)

    if args.cmd == "browse":
        for f in box.browse_datasets(args.max):
            print(f)
    elif args.cmd == "embed":
        _load_models(args, box, need_synthesis=False)
        utt = box.load_utterance(args.wav)
        out = box.save_embedding_heatmap(utt)
        print("Saved embedding heatmap to %s" % out)
    elif args.cmd == "project":
        _load_models(args, box, need_synthesis=False)
        for w in args.wavs:
            box.load_utterance(w)
        out = box.save_projection()
        print("Saved projection to %s" % out)
    elif args.cmd == "clone":
        _load_models(args, box)
        utt = box.load_utterance(args.wav)
        spec = box.synthesize(args.text, utt, seed=args.seed)
        wav, rtf = box.vocode(spec, seed=args.seed)
        out = box.save_audio(wav, f"clone_{utt.name}")
        print("Saved %s (vocoder RTF %.1fx)" % (out, rtf))
    elif args.cmd == "autotune":
        _load_models(args, box)
        utt = box.load_utterance(args.wav)
        seed, sim, wav = box.autotune(args.text, utt, n_seeds=args.n_seeds)
        out = box.save_audio(wav, f"autotune_{utt.name}_seed{seed}")
        print("Best seed %d (similarity %.4f) → %s" % (seed, sim, out))
    elif args.cmd == "tui":
        _load_models(args, box)
        from rtvc_tpu.tui import TuiState, run_curses

        run_curses(TuiState(toolbox=box, datasets_root=args.datasets_root))
    elif args.cmd == "web":
        _load_models(args, box)
        from rtvc_tpu.serve import create_server

        server = create_server(args.host, args.port, synth=box.synthesizer,
                               samples_dir=args.datasets_root)
        print(f"Browser toolbox on "
              f"http://{args.host}:{server.server_address[1]}/")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
