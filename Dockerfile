# Container for rtvc_tpu (capability parity with the reference's Dockerfile,
# which targets pytorch/cuda — this one targets JAX on TPU VMs / CPU).
#
# On a Cloud TPU VM the host libtpu is injected automatically; for CPU-only
# use (preprocessing, native-engine inference) the same image works as-is.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential g++ make cmake \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/rtvc_tpu
COPY . .

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax chex einops scipy scikit-learn matplotlib pytest \
    && pip install --no-cache-dir -e . --no-build-isolation

# Native engine (CPU deployments)
RUN rtvc_tpu/native/build.sh

CMD ["python", "demo_cli.py", "--selftest"]
