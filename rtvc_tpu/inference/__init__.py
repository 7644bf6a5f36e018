"""Public inference APIs (ref surface: encoder/inference.py,
synthesizer/inference.py, vocoder/inference.py, synthesizer/batched.py).

Beyond the reference surface: ``pipelined`` (depth-bounded async-dispatch
throughput streaming) and ``streaming`` (chunked low-latency clone,
``stream_clone``) — imported lazily by callers to keep the base import
light."""
from rtvc_tpu.inference import encoder, synthesizer, vocoder  # noqa: F401
