"""Interactive voice-cloning CLI (ref: demo_cli.py).

Runs the same two phases as the reference:
  1. a configuration self-test — encoder on zeros, synthesizer on a 2-text
     batch with a random embedding, vocoder on the concatenated mels with a
     tiny target/overlap (ref: demo_cli.py:17-126);
  2. an interactive clone loop: reference audio → embedding → text → mel →
     waveform → wav on disk (ref: demo_cli.py:129-225).

Differences from the reference environment: audio playback (sounddevice) is
unavailable here, so generated audio is always written to disk. mp3 decoding
works through the system libmpg123 (rtvc_tpu.utils.mpeg); `--no_mp3_support`
disables it like the reference flag does (ref: demo_cli.py:44-55).
"""
import argparse
import os
import sys
from pathlib import Path

import numpy as np


def build_models_for_selftest():
    """Random-weight models (the reference self-test also synthesizes from a
    random embedding; with no pretrained checkpoints shipped, random weights
    exercise the full graph)."""
    from rtvc_tpu.config.synthesizer import TacotronParams
    from rtvc_tpu.config.vocoder import WaveRNNParams
    from rtvc_tpu.inference import encoder, synthesizer, vocoder
    from rtvc_tpu.models import factories

    encoder.init_random_model(seed=0)
    syn_cfg = TacotronParams(
        embed_dims=64, encoder_dims=32, decoder_dims=64, postnet_dims=32,
        encoder_K=8, lstm_dims=64, postnet_K=4, num_highways=4,
        max_decoder_steps=400,
    )
    synth = synthesizer.Synthesizer("selftest", verbose=False)
    synth.load_bundle(
        factories.init_syn_model(
            factories.MODEL_TYPE_TACOTRON, override_hp=syn_cfg
        ),
        r=2,
    )
    voc_cfg = WaveRNNParams(
        rnn_dims=64, fc_dims=64, compute_dims=32, res_out_dims=64, res_blocks=3,
        gen_target=1000, gen_overlap=200,
    )
    vocoder.load_bundle(
        factories.init_voc_model(
            factories.MODEL_TYPE_RUNTIMERACER, override_hp=voc_cfg
        )
    )
    return synth


def config_test(args):
    """Config/self test (ref: demo_cli.py:17-126)."""
    import jax

    from rtvc_tpu.inference import encoder, synthesizer, vocoder

    print("Running a test of your configuration...\n")
    print("Devices: %s" % (jax.devices(),))

    # mp3 support probe (ref: demo_cli.py:44-55 decodes samples/1320_00000.mp3)
    if not args.no_mp3_support:
        from rtvc_tpu.utils import mpeg

        if mpeg.mpeg_supported():
            print("mp3 support: available (libmpg123)")
        else:
            print("mp3 support: NOT available — pass wav files only "
                  "(or install libmpg123)")

    from rtvc_tpu.utils import modelutils

    missing = modelutils.missing_models(
        args.enc_model_fpath, args.syn_model_fpath, args.voc_model_fpath
    )
    if not missing:
        encoder.load_model(args.enc_model_fpath)
        synth = synthesizer.Synthesizer(args.syn_model_fpath)
        synth.load()
        vocoder.load_model(args.voc_model_fpath, voc_type=args.voc_backend)
    elif len(missing) == 3:
        # no models at all: print the training guidance (ref
        # check_model_paths contract, utils/modelutils.py:3-24), then keep
        # the self-test alive on random weights — it exercises the full
        # pipeline without checkpoints
        modelutils.model_files_missing(missing)
        print("Continuing with RANDOM weights for the self-test.\n")
        synth = build_models_for_selftest()
    else:
        # a partial install is a user error — name exactly what's missing
        modelutils.model_files_missing(missing)
        sys.exit(1)

    print("Testing the encoder...")
    embed = encoder.embed_utterance(np.zeros(encoder._data.sampling_rate))
    assert embed.shape == (768,)

    # Synthesizer: 2 texts, random L2-normed embedding (ref: demo_cli.py:100-109)
    print("Testing the synthesizer... (loading the model will take a few seconds)")
    texts = ["test 1", "test 2"]
    rng = np.random.default_rng(0)
    embed = rng.random(768).astype(np.float32)
    embed /= np.linalg.norm(embed)
    embeds = [embed, embed]
    mels = synth.synthesize_spectrograms(texts, embeds)
    mel = np.concatenate(mels, axis=1)

    print("Testing the vocoder...")
    vocoder.infer_waveform(mel, target=200, overlap=50)

    print("All test passed! You can now synthesize speech.\n\n")
    return synth


def clone_loop(args, synth=None):
    from rtvc_tpu.inference import encoder, synthesizer, vocoder
    from rtvc_tpu.utils.io import save_wav

    print("Interactive generation loop")
    num_generated = 0
    synth = synth or synthesizer._model
    while True:
        try:
            in_fpath = input("Reference voice: enter an audio filepath of a "
                             "voice to be cloned (wav):\n")
            in_fpath = Path(in_fpath.replace("\"", "").replace("'", ""))

            preprocessed_wav = encoder.preprocess_wav(in_fpath)
            print("Loaded file successfully")

            embed = encoder.embed_utterance(preprocessed_wav)
            print("Created the embedding")

            text = input("Write a sentence (+-20 words) to be synthesized:\n")

            if args.seed is not None:
                vocoder.set_seed(args.seed)

            if getattr(args, "stream", False) and synth is not None \
                    and vocoder._model is not None:
                # Chunked streaming clone: audio arrives ~0.6 s at a time
                # (inference/streaming.py; TTFA ~233 ms on TPU)
                import time as _time

                from rtvc_tpu.inference.streaming import stream_clone

                t0 = _time.perf_counter()
                pieces = []
                for chunk in stream_clone(
                    synth, vocoder._model.variables, vocoder._model.dims,
                    text, embed, seed=args.seed or 0,
                    voc_config=vocoder._model.config,
                ):
                    if chunk.index == 0:
                        print("  first audio after %.0f ms"
                              % (1000 * (chunk.t_emitted - t0)))
                    pieces.append(chunk.wav)
                    print("  chunk %d: %.2f s" % (
                        chunk.index,
                        len(chunk.wav) / encoder._data.sampling_rate,
                    ))
                generated_wav = np.concatenate(pieces)
            else:
                texts = [text]
                embeds = [embed]
                specs = synth.synthesize_spectrograms(texts, embeds) if synth else \
                    synthesizer.synthesize_spectrograms(texts, embeds)
                spec = specs[0]
                print("Created the mel spectrogram")

                print("Synthesizing the waveform:")
                generated_wav = vocoder.infer_waveform(spec)

            # Pad and trim like the reference (ref: demo_cli.py:198-201)
            sr = encoder._data.sampling_rate
            generated_wav = np.pad(generated_wav, (0, sr), mode="constant")
            generated_wav = encoder.preprocess_wav(generated_wav)

            filename = "demo_output_%02d.wav" % num_generated
            save_wav(generated_wav, filename, sr)
            num_generated += 1
            print("\nSaved output as %s\n\n" % filename)
        except (EOFError, KeyboardInterrupt):
            print("\nExiting.")
            break
        except Exception as e:
            print("Caught exception: %s" % repr(e))
            print("Restarting\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument(
        "-e", "--enc_model_fpath", type=Path,
        default=Path("saved_models/default/encoder.ckpt"),
    )
    parser.add_argument(
        "-s", "--syn_model_fpath", type=Path,
        default=Path("saved_models/default/synthesizer.ckpt"),
    )
    parser.add_argument(
        "-v", "--voc_model_fpath", type=Path,
        default=Path("saved_models/default/vocoder.ckpt"),
    )
    parser.add_argument("--cpu", action="store_true", help="Run on CPU.")
    parser.add_argument("--voc_backend", type=str, default="pytorch",
                        choices=["pytorch", "libwavernn"],
                        help="Vocoder backend: JAX path ('pytorch' compat "
                             "name) or the native C++ engine.")
    parser.add_argument("--seed", type=int, default=None,
                        help="Optional random number seed for deterministic output.")
    parser.add_argument("--no_sound", action="store_true",
                        help="Accepted for API compat; audio is always saved to disk.")
    parser.add_argument("--no_mp3_support", action="store_true",
                        help="Skip the mp3 support probe (mp3 decode itself "
                             "uses the system libmpg123 when present).")
    parser.add_argument("--stream", action="store_true",
                        help="Stream the clone in ~0.6 s chunks (all three "
                             "synthesizer types; first audio in ~0.2 s "
                             "instead of after the whole utterance).")
    parser.add_argument("--selftest", action="store_true",
                        help="Run only the configuration test and exit.")
    args = parser.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    synth = config_test(args)
    if not args.selftest:
        clone_loop(args, synth)
