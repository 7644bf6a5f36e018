"""Export WaveRNN weights to the native engine's binary format.

Capability parity with the reference's converter (ref:
vocoder/libwavernn/convert.py) with a fresh format (RTVCNAT1):
  * batch-norm is folded into the adjacent conv weights at export (the
    reference serializes BN layers and executes them at runtime);
  * Linear/GRU matrices can be stored group-of-4 sparse (CSR-of-groups,
    uint16 group-column indices) — groups whose L1 mass is ~0 (pruned) are
    dropped (ref stores group-sparse with uint8 indices + 255 row markers,
    convert.py:61-84);
  * one file serves all three variants (the reference builds per-variant
    engines).

Layout (little-endian):
  magic 'RTVCNAT1'
  int32 ×10: variant, mode, n_classes, rnn_dims, fc_dims, feat_dims,
             aux_dims, res_blocks, pad, hop
  int32: n_upsample; int32[n_upsample] factors
  upsample tensors (conv_in w+b, per block w1 b1 w2 b2, conv_out w+b,
                    smoothing kernels) then I, GRUs, FCs in graph order.
Matrices:  int32 kind (0 dense f32 | 1 sparse f32 | 2 dense f16 |
           3 sparse f16), int32 rows, int32 cols, then
  dense:   float32|float16[rows*cols]
  sparse:  int32 group, int32 n_groups, int32 row_ptr[rows+1],
           uint16 group_col[n_groups], float32|float16 vals[n_groups*group]
Vectors:   int32 n, float32[n]

fp16 weights (round 4): the per-sample matrices (I, GRU, FC) dominate the
engine's DRAM traffic and the sample loop is bandwidth-bound on one core
(measured: dense 2.5 kHz × 9.8 MB ≈ 24 GB/s, sparse 8.2 kHz × 2.5 MB ≈
21 GB/s — both at the single-core DRAM ceiling), so halving the weight
bytes halves the wall time; the engine converts f16→f32 in registers
(F16C) during the GEMV. Upsample/resnet tensors run per-frame, not
per-sample, and stay f32.
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Any, BinaryIO, Dict

import numpy as np

MAGIC = b"RTVCNAT1"
VARIANT_IDS = {"fatchord-wavernn": 0, "geneing-wavernn": 1, "runtimeracer-wavernn": 2}
MODE_IDS = {"RAW": 0, "BITS": 1, "MOL": 2}


def _w(f: BinaryIO, fmt: str, *vals) -> None:
    f.write(struct.pack("<" + fmt, *vals))


def write_vec(f: BinaryIO, v: np.ndarray) -> None:
    v = np.ascontiguousarray(v, dtype=np.float32).reshape(-1)
    _w(f, "i", v.size)
    f.write(v.tobytes())


def _weight_payload(v: np.ndarray, dtype: str) -> bytes:
    if dtype == "f16":
        return np.ascontiguousarray(v, dtype=np.float16).tobytes()
    return np.ascontiguousarray(v, dtype=np.float32).tobytes()


def write_dense(f: BinaryIO, m: np.ndarray, dtype: str = "f32") -> None:
    m = np.ascontiguousarray(m, dtype=np.float32)
    assert m.ndim == 2
    _w(f, "iii", 0 if dtype == "f32" else 2, m.shape[0], m.shape[1])
    f.write(_weight_payload(m, dtype))


def write_sparse(f: BinaryIO, m: np.ndarray, group: int = 4,
                 dtype: str = "f32") -> None:
    """Group-compressed storage: keep only groups with any nonzero weight."""
    m = np.ascontiguousarray(m, dtype=np.float32)
    rows, cols = m.shape
    assert cols % group == 0, (rows, cols, group)
    n_gcols = cols // group
    blocks = m.reshape(rows, n_gcols, group)
    keep = np.abs(blocks).sum(axis=2) > 0  # (rows, n_gcols)
    row_ptr = np.zeros(rows + 1, dtype=np.int32)
    group_cols = []
    vals = []
    for r in range(rows):
        idx = np.nonzero(keep[r])[0]
        row_ptr[r + 1] = row_ptr[r] + len(idx)
        group_cols.append(idx.astype(np.uint16))
        vals.append(blocks[r, idx].reshape(-1))
    group_cols = np.concatenate(group_cols) if group_cols else np.zeros(0, np.uint16)
    vals = np.concatenate(vals) if vals else np.zeros(0, np.float32)
    _w(f, "iii", 1 if dtype == "f32" else 3, rows, cols)
    _w(f, "ii", group, int(row_ptr[-1]))
    f.write(row_ptr.tobytes())
    f.write(np.ascontiguousarray(group_cols).tobytes())
    f.write(_weight_payload(vals, dtype))


def write_matrix(f: BinaryIO, m: np.ndarray, sparse_threshold: float = 0.5,
                 group: int = 4, dtype: str = "f32") -> None:
    """Choose dense vs sparse by actual group sparsity."""
    m = np.asarray(m, dtype=np.float32)
    if m.shape[1] % group == 0:
        blocks = m.reshape(m.shape[0], m.shape[1] // group, group)
        zero_frac = float((np.abs(blocks).sum(axis=2) == 0).mean())
        if zero_frac >= sparse_threshold and m.shape[1] // group < 65536:
            write_sparse(f, m, group, dtype=dtype)
            return
    write_dense(f, m, dtype=dtype)


def fold_batchnorm(
    conv_w: np.ndarray, conv_b: np.ndarray | None, bn_p: Dict, bn_s: Dict,
    eps: float = 1e-5,
):
    """Fold inference-mode BN into the preceding conv:
    y = γ·(Wx + b − μ)/√(σ²+ε) + β  →  W' = W·s, b' = (b − μ)·s + β."""
    gamma = np.asarray(bn_p["weight"], np.float64)
    beta = np.asarray(bn_p["bias"], np.float64)
    mean = np.asarray(bn_s["running_mean"], np.float64)
    var = np.asarray(bn_s["running_var"], np.float64)
    s = gamma / np.sqrt(var + eps)
    w = np.asarray(conv_w, np.float64)
    w_f = w * s.reshape((-1,) + (1,) * (w.ndim - 1))
    b = np.zeros_like(mean) if conv_b is None else np.asarray(conv_b, np.float64)
    b_f = (b - mean) * s + beta
    return w_f.astype(np.float32), b_f.astype(np.float32)


def export_wavernn(variables: Dict[str, Any], dims, out_path: Path,
                   sparse_threshold: float = 0.5,
                   weight_dtype: str = "f32") -> None:
    """Serialize a WaveRNN variables tree (rtvc_tpu.models.wavernn layout)
    for the native engine.

    ``sparse_threshold``: group-zero fraction above which Linear/GRU
    matrices are stored group-sparse (>1 forces dense storage — used by the
    sparse-vs-dense benchmark to isolate the kernel effect on identical
    pruned weights). ``weight_dtype``: 'f32' (bit-exact vs the JAX path)
    or 'f16' for the per-sample matrices (I/GRU/FC) — halves the
    bandwidth-bound sample loop's DRAM traffic; see module docstring."""
    p = variables["params"]
    s = variables["batch_stats"]
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    rnn_names = {
        0: ["rnn1", "rnn2"],
        1: ["rnn1"],
        2: ["rnn1", "rnn2", "rnn3", "rnn4"],
    }[VARIANT_IDS[dims.variant]]
    fc_names = {
        0: ["fc1", "fc2", "fc3"],
        1: ["fc1", "fc3"],
        2: ["fc1", "fc2", "fc3", "fc4", "fc5"],
    }[VARIANT_IDS[dims.variant]]

    rp = p["upsample"]["resnet"]
    rs = s["upsample"]["resnet"]

    with open(out_path, "wb") as f:
        f.write(MAGIC)
        _w(
            f, "i" * 10,
            VARIANT_IDS[dims.variant], MODE_IDS[dims.mode], dims.n_classes,
            dims.rnn_dims, dims.fc_dims, dims.feat_dims, dims.aux_dims,
            dims.res_blocks, dims.pad, dims.hop_length,
        )
        _w(f, "i", len(dims.upsample_factors))
        for fac in dims.upsample_factors:
            _w(f, "i", fac)

        # conv_in (O, I, K) + folded BN → dense (O, K*I) matching the
        # engine's [k][channel] inner layout
        w_in, b_in = fold_batchnorm(
            np.asarray(rp["conv_in"]["weight"]), None,
            rp["batch_norm"], rs["batch_norm"],
        )
        O, I, K = w_in.shape
        write_dense(f, np.transpose(w_in, (0, 2, 1)).reshape(O, K * I))
        write_vec(f, b_in)

        for i in range(dims.res_blocks):
            blk_p, blk_s = rp["layers"][i], rs["layers"][i]
            w1, b1 = fold_batchnorm(
                np.asarray(blk_p["conv1"]["weight"])[:, :, 0], None,
                blk_p["batch_norm1"], blk_s["batch_norm1"],
            )
            w2, b2 = fold_batchnorm(
                np.asarray(blk_p["conv2"]["weight"])[:, :, 0], None,
                blk_p["batch_norm2"], blk_s["batch_norm2"],
            )
            write_dense(f, w1)
            write_vec(f, b1)
            write_dense(f, w2)
            write_vec(f, b2)

        write_dense(f, np.asarray(rp["conv_out"]["weight"])[:, :, 0])
        write_vec(f, np.asarray(rp["conv_out"]["bias"]))

        for i in range(len(dims.upsample_factors)):
            write_vec(f, np.asarray(p["upsample"]["up_convs"][i]).reshape(-1))

        write_matrix(f, np.asarray(p["I"]["weight"]),
                     sparse_threshold=sparse_threshold, dtype=weight_dtype)
        write_vec(f, np.asarray(p["I"]["bias"]))

        for nm in rnn_names:
            write_matrix(f, np.asarray(p[nm]["weight_ih_l0"]),
                         sparse_threshold=sparse_threshold,
                         dtype=weight_dtype)
            write_matrix(f, np.asarray(p[nm]["weight_hh_l0"]),
                         sparse_threshold=sparse_threshold,
                         dtype=weight_dtype)
            write_vec(f, np.asarray(p[nm]["bias_ih_l0"]))
            write_vec(f, np.asarray(p[nm]["bias_hh_l0"]))

        for nm in fc_names:
            write_matrix(f, np.asarray(p[nm]["weight"]),
                         sparse_threshold=sparse_threshold,
                         dtype=weight_dtype)
            write_vec(f, np.asarray(p[nm].get("bias", np.zeros(0))))
