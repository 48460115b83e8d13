"""Pallas one-hot prefix-sum kernel vs the XLA reference formulation.

Runs in interpret mode (tests force CPU); the compiled kernel is exercised
on the real TPU by the permutation engine and bench/micro benchmarks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from fscl_tpu.ops.pallas_ps import TILE_W, onehot_prefix_sums, ps_supported


@pytest.mark.parametrize("lanes_mult", [1, 2])
def test_onehot_prefix_sums_matches_reference(lanes_mult):
    rng = np.random.default_rng(3)
    R = 8
    P = 16 * lanes_mult
    W = 2 * TILE_W
    rows = rng.integers(0, R + 1, size=(W, P)).astype(np.int32)  # R = pad
    rows_exp = np.repeat(rows, R, axis=1)
    out = np.asarray(
        onehot_prefix_sums(jnp.asarray(rows_exp), n_rows=R, interpret=True)
    )
    oh = (rows[:, :, None] == np.arange(R)).astype(np.int32)
    ref = np.cumsum(oh.reshape(W, P * R), axis=0).astype(np.int16)
    np.testing.assert_array_equal(out, ref)


def test_ps_supported_gates():
    assert ps_supported(4096, 128)
    assert not ps_supported(4096 + 1, 128)  # tile misalignment
    assert not ps_supported(4096, 8)  # single-replicate scan build
    assert ps_supported(4096, 8192)  # wide lanes block over the 2nd grid axis
    assert not ps_supported(4096, 2048 + 128)  # non-multiple of the lane tile


def test_segmented_reset_matches_per_segment_cumsum():
    """reset_every restarts the running sum at each segment boundary."""
    rng = np.random.default_rng(7)
    S, seg, L = 3, TILE_W * 2, 256
    oh = (rng.random((S * seg, L)) < 0.3).astype(np.int8)
    out = np.asarray(
        onehot_prefix_sums(
            jnp.asarray(oh), out_dtype=jnp.int16, reset_every=seg,
            interpret=True,
        )
    )
    ref = np.cumsum(
        oh.reshape(S, seg, L).astype(np.int32), axis=1
    ).reshape(S * seg, L).astype(np.int16)
    np.testing.assert_array_equal(out, ref)


def test_build_prefix_sums_seg_fallback():
    """The XLA fallback (CPU backend) computes identical segmented sums."""
    from fscl_tpu.ops.histclr import build_prefix_sums_seg

    rng = np.random.default_rng(9)
    S, seg, L = 4, 96, 64  # seg NOT a TILE_W multiple -> XLA path
    oh = (rng.random((S * seg, L)) < 0.4).astype(np.int8)
    out = np.asarray(build_prefix_sums_seg(jnp.asarray(oh), seg_len=seg))
    ref = np.cumsum(
        oh.reshape(S, seg, L).astype(np.int32), axis=1
    ).reshape(S * seg, L)
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out.astype(np.int32), ref)
