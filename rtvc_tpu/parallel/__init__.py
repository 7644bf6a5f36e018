"""Mesh + sharding helpers; fold-sharded multi-chip generation."""
from rtvc_tpu.parallel import mesh  # noqa: F401
