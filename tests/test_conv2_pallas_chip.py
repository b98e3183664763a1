"""Full-size fused conv2 kernel parity on the real chip (slow suite).

Pins mgrid_conv2_fused against the XLA dilated-conv + bias + BN + ReLU
route at the production geometry (chunk=160 frames, 43 pooled rows,
w_pool=78) in both dtypes. The full-tower integration at this geometry is
covered by test_stem_pallas_chip.py (the tower body now routes layer 2
through this kernel). Skipped on CPU; interpret-mode logic is covered by
test_conv2_pallas.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jegal_tpu.core.layers import batch_norm_inference
from jegal_tpu.ops.pallas import conv2 as C2K
from jegal_tpu.ops.pallas import stem as S

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def blk2():
    rng = np.random.default_rng(3)
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


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs a TPU backend")
@pytest.mark.parametrize("dtype,tol", [(jnp.bfloat16, 0.6),
                                       (jnp.float32, 1e-3)])
def test_full_size_parity(blk2, dtype, tol):
    rng = np.random.default_rng(0)
    t, n_j, w_pool = 160, 43, 78
    m = np.zeros((t, n_j, 64, S.SLOT), np.float32)
    m[:, :, :, 0:2 * w_pool:2] = rng.standard_normal((t, n_j, 64, w_pool))
    m = jnp.asarray(m, dtype)

    def xla_path(mm):
        y = S.mgrid_conv2(mm, blk2["conv"]["kernel"][0].astype(mm.dtype),
                          w_pool)
        y = y + blk2["conv"]["bias"].astype(mm.dtype)
        return jax.nn.relu(batch_norm_inference(blk2["bn"], y))

    ops = C2K.conv2_kernel_params(blk2)
    # apples-to-apples: the kernel's dots run at Precision.DEFAULT (Mosaic
    # rejects the multi-pass f32 emulation HIGHEST would request — same as
    # the stem kernel), so the XLA oracle must run at DEFAULT too; the
    # conftest pins HIGHEST globally for the torch-parity suites.
    with jax.default_matmul_precision("default"):
        a = np.asarray(jax.jit(xla_path)(m), np.float32)
    b = np.asarray(jax.jit(
        lambda mm: C2K.mgrid_conv2_fused(mm, *ops, w_pool))(m), np.float32)
    assert a.shape == b.shape == (t, 20, 37, 128)
    assert np.abs(a - b).max() < tol
