"""Fused VGG block-2 conv over the stem's m-grid: lane compaction + matmul.

Replaces `stem.mgrid_conv2` + bias + BN + ReLU (the reference conv2 block:
k(1,5,5) s(1,2,2) p0, 64->128 channels + bn2 + relu — reference
models/gestsync.py:47-53) with one Pallas TPU kernel. The XLA dilated-conv
formulation reads the m-grid's stride-2 pooled lanes through rhs_dilation=2 /
window_stride=4 and caps at ~13 TF/s (~2.5 ms/clip) — the dilated lane
access starves the MXU. This kernel compacts the lanes first, with the MXU
itself, then runs the conv as dense matmuls:

  * the m-grid (stem.py) holds pooled w' at lane 2*w'; output w2 needs taps
    w' = 2*w2 + dw, i.e. m-grid lanes 4*w2 + 2*dw — a stride-4 access,
  * **phase split**: lanes 4k feed a dense E plane (E[k] = w'=2k) and lanes
    4k+2 a dense O plane (O[k] = w'=2k+1). Even kw taps then read
    E[w2 + dw/2] and odd taps O[w2 + (dw-1)/2] — every tap a CONTIGUOUS
    unit-stride slice,
  * the compaction itself is a matmul against a constant 0/1 selection
    matrix S (w_lanes, 2*RUN): MXU shuffles, no lane gathers. Selection of
    bf16 values through an f32-accumulating dot is exact,
  * the conv is then two dense dots with the kw taps stacked in the lhs M
    dim (the stem kernel's trick): dotE (3 even taps x 128, 5kh*64c=320) and
    dotO (2 odd taps x 128, 320) against E/O row blocks, combined with lane
    rolls (y[w2] = dE0[w2] + dE2[w2+1] + dE4[w2+2] + dO1[w2] + dO3[w2+1]),
  * conv bias + BN are folded into a per-channel scale/bias, ReLU applied
    in-register; the (frame, w2) unpack to NHWC happens in XLA on the 16x
    smaller output.

Frames pack TIGHT in the dot N dim (T_BLK frames x RUN lanes, RUN = W2+3 =
40 for the production 78-wide pooled grid); rolls crossing frame runs only
contaminate w2 >= W2 lanes nobody reads.

Numerics: both dots accumulate in f32, epilogue in f32, output cast to the
input dtype — at least as accurate as the XLA path it replaces. Parity is
pinned against mgrid_conv2(+BN+ReLU) in interpret mode on small geometry
and full-size on chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C1 = 64            # m-grid channels (stem output)
C2 = 128           # conv2 output channels
KH = 5             # conv2 h taps
KW = 5             # conv2 w taps (stride 2 in pooled w)
K2 = KH * C1       # conv contraction: 5 kh x 64 c

# dispatch switch, same convention as fused_layer: which block-2 conv
# formulation the shared tower body uses (models/gestsync.py
# _make_stem_chunk_fn):
#   "dense"  - compaction-matmul + s2d(2) dense conv (stem.mgrid_conv2_dense);
#              pure XLA and the measured-fastest form on chip -> default,
#   "kernel" - the fused Pallas lane-compaction kernel below,
#   "off"    - dilated mgrid_conv2; parity oracle.
_IMPL = "dense"


def set_impl(impl: str):
    global _IMPL
    if impl == "auto":        # restore the measured-fastest default
        impl = "dense"
    assert impl in ("dense", "kernel", "off"), impl
    _IMPL = impl


def impl() -> str:
    return _IMPL


def _conv2_kernel(m_ref, s_ref, lhs_e_ref, lhs_o_ref, scale_ref, bias_ref,
                  o_ref, a0_ref, rhs_e_ref, rhs_o_ref, sem_ref, *,
                  n_tb, n_j2, t_blk, run, w_lanes):
    """Grid (n_tb, n_j2), j2 innermost. Cell (tb, j2) consumes m-grid rows
    [2*j2, 2*j2+5) of frames [tb*t_blk, (tb+1)*t_blk) and emits the conv2
    output row j2 for those frames: (C2, t_blk*run) with w2 tight per frame
    run (lanes >= W2 of each run are invalid)."""
    tb = pl.program_id(0)
    j2 = pl.program_id(1)
    k = tb * n_j2 + j2
    n_cells = n_tb * n_j2
    nlanes = t_blk * run

    # the DMA copies all SLOT lanes (a lane sub-slice of an HBM ref would
    # break the (8,128) tiling); the compute below reads only w_lanes
    def dma(slot, tb_, j2_):
        return pltpu.make_async_copy(
            m_ref.at[pl.ds(tb_ * t_blk, t_blk), pl.ds(2 * j2_, KH)],
            a0_ref.at[slot],
            sem_ref.at[slot],
        )

    # double-buffered input DMA (stem kernel's scheme): this cell's copy was
    # started by the previous cell; start the next cell's now.
    @pl.when(k == 0)
    def _():
        dma(0, tb, j2).start()

    @pl.when(k + 1 < n_cells)
    def _():
        nj = j2 + 1
        dma((k + 1) % 2, tb + nj // n_j2, nj % n_j2).start()

    dma(k % 2, tb, j2).wait()
    slot = k % 2

    # lane compaction on the MXU: per frame, contract the w_lanes against
    # the selection matrix -> [E | O] planes (zero beyond the valid grid)
    for u in range(t_blk):
        x = a0_ref[slot, u, :, :, :w_lanes].reshape(KH * C1, w_lanes)
        c = jax.lax.dot_general(
            x, s_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        c = c.astype(rhs_e_ref.dtype)
        rhs_e_ref[:, run * u:run * (u + 1)] = c[:, :run]
        rhs_o_ref[:, run * u:run * (u + 1)] = c[:, run:]

    d_e = jax.lax.dot_general(                      # (3*C2, nlanes) f32
        lhs_e_ref[...], rhs_e_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    d_o = jax.lax.dot_general(                      # (2*C2, nlanes) f32
        lhs_o_ref[...], rhs_o_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    # y[w2] = dE0[w2] + dE2[w2+1] + dE4[w2+2] + dO1[w2] + dO3[w2+1]; the
    # rolls cross frame runs only at lanes >= W2 = run-3 no consumer reads.
    y = (d_e[0:C2]
         + pltpu.roll(d_e[C2:2 * C2], shift=nlanes - 1, axis=1)
         + pltpu.roll(d_e[2 * C2:3 * C2], shift=nlanes - 2, axis=1)
         + d_o[0:C2]
         + pltpu.roll(d_o[C2:2 * C2], shift=nlanes - 1, axis=1))
    y = jnp.maximum(y * scale_ref[...] + bias_ref[...], 0.0)
    o_ref[0, 0] = y.astype(o_ref.dtype)


def conv2_kernel_params(blk2, eps: float = 1e-5):
    """Fold the conv2 kernel + bias + BatchNorm into kernel operands.

    blk2: {"conv": {kernel (1,5,5,64,128), bias?}, "bn": {...}} — the
    net_vid[1] block (reference models/gestsync.py:47-53).
    Returns (lhs_e (3*C2, K2), lhs_o (2*C2, K2), scale (C2,1) f32,
    bias (C2,1) f32)."""
    k2 = blk2["conv"]["kernel"][0]                  # (5, 5, 64, 128)
    # lhs rows (dw-group, o); K cols (dh, c) — matches the E/O row blocks
    per_dw = k2.transpose(1, 3, 0, 2).reshape(KW, C2, K2)
    lhs_e = per_dw[0::2].reshape(3 * C2, K2)
    lhs_o = per_dw[1::2].reshape(2 * C2, K2)

    bn = blk2["bn"]
    scale = (bn["scale"].astype(jnp.float32)
             * jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps))
    bias = (bn["bias"].astype(jnp.float32)
            - bn["mean"].astype(jnp.float32) * scale)
    cb = blk2["conv"].get("bias")
    if cb is not None:
        bias = bias + cb.astype(jnp.float32) * scale
    return lhs_e, lhs_o, scale[:, None], bias[:, None]


def _selection_matrix(w_pool: int, run: int, dtype) -> np.ndarray:
    """(2*w_pool, 2*run) 0/1: col k selects lane 4k (E plane, w'=2k), col
    run+k selects lane 4k+2 (O plane, w'=2k+1); out-of-grid cols stay zero
    (clean zero padding instead of garbage lanes)."""
    w_lanes = 2 * w_pool
    s = np.zeros((w_lanes, 2 * run), dtype)
    for k in range(run):
        if 4 * k < w_lanes:                         # w' = 2k < w_pool
            s[4 * k, k] = 1
        if 4 * k + 2 < w_lanes:                     # w' = 2k+1 < w_pool
            s[4 * k + 2, run + k] = 1
    return s


def conv2_ok(w_pool: int, n_j: int) -> bool:
    """Geometry contract: enough pooled rows/cols for one 5-tap window."""
    return w_pool >= KW and n_j >= KH


def mgrid_conv2_fused(m, lhs_e, lhs_o, scale, bias, w_pool: int,
                      interpret: bool = False):
    """m-grid (T, J, 64, SLOT) -> conv2+BN+ReLU output (T, J2, W2, C2) NHWC.

    Fused replacement for stem.mgrid_conv2 + bias + batch_norm + relu with
    operands from conv2_kernel_params. T pads to the frame block; J2 =
    (J-5)//2+1, W2 = (w_pool-5)//2+1."""
    t, n_j = m.shape[:2]
    n_j2 = (n_j - KH) // 2 + 1
    w2 = (w_pool - KW) // 2 + 1
    run = w2 + 3                  # tap offsets reach w2-1+2; +1 spare lane
    w_lanes = 2 * w_pool
    # f32 doubles every VMEM buffer; halve the frame block to compensate
    t_blk = 16 if m.dtype == jnp.bfloat16 else 8
    n_tb = -(-t // t_blk)
    m = jnp.pad(m, ((0, n_tb * t_blk - t), (0, 0), (0, 0), (0, 0)))

    s = jnp.asarray(_selection_matrix(w_pool, run, np.float32)).astype(m.dtype)
    out = pl.pallas_call(
        functools.partial(_conv2_kernel, n_tb=n_tb, n_j2=n_j2, t_blk=t_blk,
                          run=run, w_lanes=w_lanes),
        grid=(n_tb, n_j2),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((w_lanes, 2 * run), lambda tb, j2: (0, 0)),
            pl.BlockSpec((3 * C2, K2), lambda tb, j2: (0, 0)),
            pl.BlockSpec((2 * C2, K2), lambda tb, j2: (0, 0)),
            pl.BlockSpec((C2, 1), lambda tb, j2: (0, 0)),
            pl.BlockSpec((C2, 1), lambda tb, j2: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, C2, t_blk * run),
                               lambda tb, j2: (tb, j2, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tb, n_j2, C2, t_blk * run),
                                       m.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, t_blk, KH, C1, m.shape[3]), m.dtype),
            pltpu.VMEM((K2, t_blk * run), m.dtype),
            pltpu.VMEM((K2, t_blk * run), m.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(m, s, lhs_e.astype(m.dtype), lhs_o.astype(m.dtype), scale, bias)
    # (n_tb, J2, C2, t_blk*run) -> (T, J2, W2, C2) NHWC for block 3
    out = out.reshape(n_tb, n_j2, C2, t_blk, run)
    out = out.transpose(0, 3, 1, 4, 2).reshape(n_tb * t_blk, n_j2, run, C2)
    return out[:t, :, :w2]
