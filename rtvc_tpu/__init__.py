"""rtvc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) real-time voice-cloning framework.

A from-scratch rebuild of the SV2TTS three-stage pipeline (speaker encoder →
synthesizer → vocoder) found in RuntimeRacer/Real-Time-Voice-Cloning, designed
TPU-first rather than translated from the PyTorch reference:

* the compute path is pure JAX — jitted XLA graphs, ``lax.scan`` recurrences and
  Pallas kernels for the autoregressive hot loops;
* parallelism is expressed as shardings over a ``jax.sharding.Mesh`` (data /
  fold axes over ICI), not wrapped DDP;
* the host runtime around it (binary weight export, native sample loop for
  CPU-only deploys) is C++ (see ``rtvc_tpu/native``).

Layer map (mirrors SURVEY.md §1 for the reference):

=========  ===========================================================
subpkg     role
=========  ===========================================================
config     typed dataclass hyper/signal parameters (ref: config/hparams.py)
ops        DSP ops: STFT/mel/Griffin-Lim/mu-law/VAD/resample + Pallas kernels
models     speaker encoder (GE2E), Tacotron, ForwardTacotron, FastPitch,
           WaveRNN family, output distributions, pruning masks
parallel   mesh construction + sharding helpers (DP/fold parallel)
train      trainers (session schedules, SGDR LR), checkpointing, GTA
data       preprocessing pipelines, dataset readers, GE2E batch sampler
text       text frontend: symbols, cleaners, number expansion
inference  public API surface: encoder / synthesizer / vocoder inference
utils      wav IO, profiler, display helpers
native     C++ host engine (libwavernn-equivalent) + converter
=========  ===========================================================
"""

__version__ = "0.1.0"
