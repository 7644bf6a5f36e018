"""Smoke-test the native vocoder engine: mel npy → wav
(ref: vocoder_check_libwavernn.py)."""
import argparse
from pathlib import Path

import numpy as np

from rtvc_tpu.config import sp
from rtvc_tpu.native import libwavernn
from rtvc_tpu.utils.io import save_wav

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("weights", type=Path, help="Native .bin weights")
    parser.add_argument("mel", type=Path, help="Mel spectrogram .npy (T, 80) or (80, T)")
    parser.add_argument("-o", "--out", type=Path, default=Path("libwavernn_check.wav"))
    parser.add_argument("--model_type", type=str, default="runtimeracer-wavernn")
    parser.add_argument("--seed", type=int, default=1337)
    args = parser.parse_args()

    mel = np.load(args.mel).astype(np.float32)
    if mel.shape[0] != sp.num_mels:
        mel = mel.T
    print("Mel: %s" % (mel.shape,))

    voc = libwavernn.Vocoder(args.weights, args.model_type)
    voc.load()
    voc.setRandomSeed(args.seed)
    wav = voc.vocode_mel(mel)
    save_wav(wav, args.out, sp.sample_rate)
    print("Wrote %d samples (%.2f s) to %s"
          % (len(wav), len(wav) / sp.sample_rate, args.out))
