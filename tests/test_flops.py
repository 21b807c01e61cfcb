"""Useful-FLOP accounting (utils/flops.py): the efficiency denominator
bench.py / bench_step.py report as `mfu` (VERDICT r4 weak #6)."""

import pytest

from nbody_tpu import config as C
from nbody_tpu.utils.flops import (PEAK_FLOPS, mfu, useful_flops_forward,
                                   useful_flops_train_step)


@pytest.mark.parametrize("family,channels", [
    ("shiftinv", C.GRAPH_CHANNELS),
    ("shiftinv_vel", C.GRAPH_VEL_CHANNELS),
    ("shiftinv15", C.GRAPH_CHANNELS),
    ("set", C.CHANNELS),
    ("attn", C.ATTN_CHANNELS),
])
def test_useful_flops_families(family, channels):
    n, b, k = 32 ** 3, 4, 14
    fwd = useful_flops_forward(family, n, b, k, channels)
    assert fwd > 0
    assert useful_flops_train_step(family, n, b, k, channels) == 3.0 * fwd
    # scales ~linearly in particles (global-pool matmuls are n-free)
    assert useful_flops_forward(family, 2 * n, b, k, channels) == \
        pytest.approx(2 * fwd, rel=1e-3)
    # exactly linear in batch
    assert useful_flops_forward(family, n, 2 * b, k, channels) == 2 * fwd


def test_shiftinv_flops_match_hand_count():
    # one layer c=3 -> q=32 at n=8, b=1, k=2:
    # ops1+2: 2*1*8*2*3*32*2 ; op3: 2*1*8*3*32 ; op4: 2*1*3*32
    got = useful_flops_forward("shiftinv", 8, 1, 2, [3, 32])
    assert got == 2 * 8 * 2 * 3 * 32 * 2 + 2 * 8 * 3 * 32 + 2 * 3 * 32


def test_mfu_sane_range():
    # round-4 headline: 171.4 ms at 32^3 b4 K14 — MFU ~1% (PERF.md)
    v = mfu("shiftinv", 32 ** 3, 4, 14, C.GRAPH_CHANNELS, 0.1714,
            "bfloat16")
    assert 0.0005 < v < 0.05
    assert PEAK_FLOPS["bfloat16"] > PEAK_FLOPS["float32"]


def test_unknown_family_raises():
    with pytest.raises(ValueError):
        useful_flops_forward("nope", 8, 1, 2, [3, 4])
