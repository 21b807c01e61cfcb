"""Useful-FLOP accounting: the efficiency denominator for bench numbers.

"Useful" FLOPs are the model's mathematical work — the weight matmuls and
unavoidable reductions — counting every neighbor gather/scatter as FREE
data movement (semantically it moves values, it computes nothing).  This
is the FLOP count of the pure-matmul twin (scripts/profile_step4.py
component C), so

    MFU = useful_flops / step_seconds / peak_flops

measures how far the neighbor-op ENCODING (one-hot mask einsums on this
platform) is from a hypothetical zero-cost gather, in hardware terms.
Round-4 decomposition: the 4-op family's 171.4 ms step vs its 17.4 ms
matmul twin -> ~10% time efficiency, ~1% useful-FLOP MFU — the number the
mask-roofline argument is denominated in (VERDICT r4 weak #6).

Reference twins being scored: the TF1 layer matmuls at graph.py:367-391
(4-op), graph.py:20-200 (15-op), utils.py:300-320 (set).
"""

from __future__ import annotations

from typing import Sequence

# v5e peak: ~197 TFLOP/s bf16, ~98.5 TFLOP/s f32 (one MXU per chip)
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 98.5e12}


def _pairs(channels: Sequence[int]):
    return list(zip(channels[:-1], channels[1:]))


def useful_flops_forward(family: str, n: int, batch: int, k: int,
                         channels: Sequence[int]) -> float:
    """Forward-pass useful FLOPs (multiply-accumulate = 2 FLOPs)."""
    b = batch
    total = 0.0
    if family in ("shiftinv", "shiftinv_vel"):
        # per layer (graph.py:367-391): two edge-level matmuls (ops 1-2),
        # one node-pool matmul (op 3), one global matmul (op 4)
        for c, q in _pairs(channels):
            total += 2.0 * b * n * k * c * q * 2       # ops 1+2, edge level
            total += 2.0 * b * n * c * q               # op 3, node level
            total += 2.0 * b * c * q                   # op 4, global
    elif family == "shiftinv15":
        # per layer (graph.py:20-200): ops 1-2 edge level on the 2-block
        # symmetrized edge set (2NK slots), ops 3-9/13-15 node level,
        # ops 10-12 global
        for c, q in _pairs(channels):
            total += 2.0 * b * (2 * n * k) * c * q * 2     # ops 1, 2
            total += 2.0 * b * n * c * q * 9               # node-level ops
            total += 2.0 * b * c * q * 4                   # global ops
    elif family == "set":
        # per layer (utils.py:300-320): per-particle matmul + pooled matmul
        for c, q in _pairs(channels):
            total += 2.0 * b * n * c * q * 2
    elif family == "attn":
        # per layer: per-particle matmul + the K-neighbor attention gate
        for c, q in _pairs(channels):
            total += 2.0 * b * n * c * q * 2 + 2.0 * b * n * k * q
    else:
        raise ValueError(f"unknown family {family!r}")
    return total


def useful_flops_train_step(family: str, n: int, batch: int, k: int,
                            channels: Sequence[int]) -> float:
    """Full train step: forward + backward (~2x forward for matmul chains;
    the optimizer update is elementwise noise at these sizes)."""
    return 3.0 * useful_flops_forward(family, n, batch, k, channels)


def mfu(family: str, n: int, batch: int, k: int, channels: Sequence[int],
        step_seconds: float, dtype: str = "bfloat16") -> float:
    """Useful-FLOP model FLOPs utilization of a measured train step."""
    fl = useful_flops_train_step(family, n, batch, k, channels)
    return fl / step_seconds / PEAK_FLOPS.get(dtype, PEAK_FLOPS["bfloat16"])
