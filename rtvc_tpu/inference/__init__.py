"""Public inference APIs (ref surface: encoder/inference.py,
synthesizer/inference.py, vocoder/inference.py, synthesizer/batched.py)."""
from rtvc_tpu.inference import encoder, synthesizer, vocoder  # noqa: F401
