"""DSP + kernel ops: STFT/mel/Griffin-Lim/mu-law (JAX), VAD/resample (host),
Pallas kernels for the autoregressive hot loops."""
from rtvc_tpu.ops import audio, mel, resample, stft, vad  # noqa: F401
