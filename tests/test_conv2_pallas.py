"""Fused lane-compaction conv2 kernel: parity vs the XLA m-grid path
(interpret mode).

The kernel replaces mgrid_conv2 + bias + BN + ReLU (the reference conv2
block, models/gestsync.py:47-53). Small geometry keeps the interpreter
fast; full-size on-chip parity runs in the slow suite
(test_conv2_pallas_chip.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jegal_tpu.core.layers import batch_norm_inference
from jegal_tpu.ops.pallas import conv2 as C2K
from jegal_tpu.ops.pallas import stem as S


@pytest.fixture(scope="module")
def blk2():
    rng = np.random.default_rng(2)
    return {
        "conv": {
            "kernel": jnp.asarray(
                rng.standard_normal((1, 5, 5, 64, 128)), jnp.float32) * 0.05,
            "bias": jnp.asarray(rng.standard_normal(128), jnp.float32) * 0.1,
        },
        "bn": {
            "scale": jnp.asarray(rng.standard_normal(128), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(128), jnp.float32) * 0.1,
            "mean": jnp.asarray(rng.standard_normal(128), jnp.float32) * 0.1,
            "var": jnp.asarray(rng.random(128) + 0.5, jnp.float32),
        },
    }


def _mgrid(rng, t, n_j, w_pool, dtype=jnp.float32, fill=0.0):
    """Synthetic m-grid: pooled values at even lanes < 2*w_pool; `fill`
    elsewhere (the contract says those lanes are never read)."""
    m = np.full((t, n_j, 64, S.SLOT), fill, np.float32)
    m[:, :, :, 0:2 * w_pool:2] = rng.standard_normal((t, n_j, 64, w_pool))
    return jnp.asarray(m, dtype)


def xla_conv2(blk2, m, w_pool):
    y = S.mgrid_conv2(m, blk2["conv"]["kernel"][0], w_pool)
    y = y + blk2["conv"]["bias"]
    return jax.nn.relu(batch_norm_inference(blk2["bn"], y))


@pytest.mark.parametrize("t,n_j,w_pool", [(10, 7, 10), (18, 11, 14),
                                          (3, 5, 5)])
def test_fused_conv2_parity(blk2, rng, t, n_j, w_pool):
    """conv + bias + BN + ReLU == kernel across geometries incl. tail
    t-padding (t=10 pads to 16, t=3 to 8) and the minimum 5x5 grid."""
    m = _mgrid(rng, t, n_j, w_pool)
    ref = np.asarray(xla_conv2(blk2, m, w_pool), np.float32)
    ops = C2K.conv2_kernel_params(blk2)
    out = np.asarray(
        C2K.mgrid_conv2_fused(m, *ops, w_pool, interpret=True), np.float32)
    assert ref.shape == out.shape
    np.testing.assert_allclose(ref, out, atol=1e-4, rtol=1e-4)


def test_fused_conv2_ignores_garbage_lanes(blk2, rng):
    """The m-grid contract: odd lanes / lanes >= 2*w_pool are garbage the
    consumer must never read — a huge fill value must not leak through
    (the selection matmul zeroes out-of-grid columns)."""
    t, n_j, w_pool = 8, 7, 10
    clean = _mgrid(np.random.default_rng(7), t, n_j, w_pool, fill=0.0)
    dirty = np.asarray(clean).copy()
    mask = np.ones(S.SLOT, bool)
    mask[0:2 * w_pool:2] = False
    dirty[:, :, :, mask] = 1e30
    ops = C2K.conv2_kernel_params(blk2)
    a = np.asarray(C2K.mgrid_conv2_fused(clean, *ops, w_pool,
                                         interpret=True))
    b = np.asarray(C2K.mgrid_conv2_fused(jnp.asarray(dirty), *ops, w_pool,
                                         interpret=True))
    np.testing.assert_array_equal(a, b)


def test_fused_conv2_bf16(blk2, rng):
    """bf16 m-grid (the production dtype): kernel output within the bf16
    envelope of the f32 oracle."""
    t, n_j, w_pool = 20, 9, 12
    m32 = _mgrid(rng, t, n_j, w_pool)
    ref = np.asarray(xla_conv2(blk2, m32, w_pool), np.float32)
    ops = C2K.conv2_kernel_params(blk2)
    out = np.asarray(C2K.mgrid_conv2_fused(
        m32.astype(jnp.bfloat16), *ops, w_pool, interpret=True), np.float32)
    # bf16 inputs + f32 accumulation: absolute tolerance at the activation
    # scale (|ref| up to ~30 here)
    np.testing.assert_allclose(ref, out, atol=0.5, rtol=0.05)


def test_chunk_fn_conv2_impls_agree(rng):
    """The shared tower body routes layer 2 per conv2.set_impl, and all
    three formulations (dense / Pallas kernel / dilated oracle) agree —
    guards the dispatch wiring and the dense-path numerics."""
    from jegal_tpu.models import gestsync as G

    assert C2K.impl() == "dense"      # package default
    params = G.init_params(jax.random.PRNGKey(0))
    frames = jnp.asarray(rng.random((13, 270, 480, 3)), jnp.float32)
    x = S.s2d_lanes(frames)
    w_pool = (480 // 3 - 5) // 2 + 1
    outs = {}
    try:
        for impl in ("dense", "kernel", "off"):
            C2K.set_impl(impl)
            fn = G._make_stem_chunk_fn(params, w_pool, w_valid=160,
                                       interpret=True)
            outs[impl] = np.asarray(fn(x), np.float32)
    finally:
        C2K.set_impl("dense")
    assert outs["dense"].shape == outs["off"].shape == (9, 512)
    np.testing.assert_allclose(outs["dense"], outs["off"],
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(outs["kernel"], outs["off"],
                               atol=2e-3, rtol=2e-3)
