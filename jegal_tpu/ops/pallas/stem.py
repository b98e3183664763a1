"""Fused GestSync stem: space-to-depth conv + BN + ReLU + 3x3/2 max-pool.

Replaces the reference stem (models/gestsync.py:35-45 conv1 k(5,7,7) s(1,3,3)
+ bn1 + relu + maxpool (1,3,3)/(1,2,2), applied in VGGNet.forward
models/gestsync.py:308-313) — the single hottest op in the pipeline — with
one Pallas TPU kernel. XLA's conv for this shape is capped by the K=27
contraction (27/128 MXU lanes used); this kernel rebuilds the conv as dense
K=480 matmuls and fuses everything through the pool so the 260 MB conv
output never round-trips HBM.

Decomposition (after space-to-depth with block 3, so all strides are 1):

  * input X: (T4, H, 32, W256) — s2d channels (27, zero-padded to 32) in
    sublanes, the 160 w-positions in lanes (zero-padded to 256),
  * the kw taps (dw in {0,1,2}) are NOT part of the contraction: the three
    dw weight matrices are stacked into the lhs M dim (192 = 3*64) and the
    partial products are combined post-matmul with lane rolls,
  * the kt (5) and kh (3) taps + 32 channels form a dense K=480 contraction,
  * per output frame t, the rhs window lives at rows [96*t, 96*t+480) of the
    DMA'd (tau, h, c) block — T_BLK frames are packed tight into one
    (480, T_BLK*w_v) matmul (16 frames measured faster than 8: half the
    dots and half the per-block DMA halo for the same copy traffic),
  * BN is folded into a per-channel scale/bias, ReLU applied in-register,
  * the 3x3/2 max-pool's h-window is the grid: cell (tb, j) computes conv
    rows 2j+1, 2j+2 and carries row 2j from cell (tb, j-1) — no recompute;
    the w-window is two more lane rolls; the stride-2 w-decimation and the
    (o, w) -> (w, o) transpose happen in XLA on the pooled (4x smaller)
    output.

Output layout ("m-grid"): (T, J, 64, 256) with the pooled w at even lanes
[0, 2, .., 2*(W_POOL-1)]; layer 2 consumes it directly via `mgrid_conv2`
(w decimation folded in as conv dilation), or `fused_stem_pool` decimates
to plain NDHWC for tests.

Numerics: matmuls accumulate in f32, BN+ReLU in f32, pooled in the compute
dtype — at least as accurate as the XLA path it replaces (conv -> bf16 ->
BN). Parity is pinned against the XLA path in tests (interpret mode on
small geometry + full-size on-chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_BLK = 16         # output frames per matmul (N = T_BLK * w_v lanes);
#                    halved for 4-byte dtypes (f32 doubles every scratch
#                    buffer and 16-frame packing overruns the ~18 MB scoped
#                    VMEM stack limit — see stem_mgrid_x)
SLOT = 256         # lanes per frame slot (w 0..159 valid, 128-aligned)
C_PAD = 32         # s2d channels 27 padded to one bf16 sublane tile
M_DW = 192         # lhs rows: 3 dw taps x 64 output channels
K_DIM = 480        # contraction: 5 kt x 3 kh x 32 c
K_BAND = 160       # one kh tap's K rows (5 kt x 32 c) — the band kernel's
#                    incremental rhs build unit (see _stem_kernel_band)
STEM_IMPL = "window"  # 'band' | 'window' — default stem kernel variant
#                       (module-level so the A/B flips one constant)
STEM_U8_DIRECT = True   # window kernel, u8 input: build rhs windows
#                         DIRECTLY from the u8 block (cast fused into the
#                         window copy) instead of a serial full-block cast
#                         pass per cell — the r4 roofline's "building
#                         windows directly from u8". Measured on chip
#                         (benchmarks/ab_stem.py, bit-equal probes):
#                         4.985 -> 4.865 ms/chunk (+2.4%); adopted default
STEM_PAIR_DOT = False   # window kernel: both new conv rows of a cell in
#                         ONE (192, 480) @ (480, 2*nlanes) dot — halves the
#                         dot-issue count (tests the r4 "dot-serialization
#                         bound" conclusion). NEGATIVE: 5.080 ms/chunk
#                         (~2% slower; and 16.0 ms combined with u8_direct
#                         — the doubled fused-cast window build blocks the
#                         wide dot). Kept flag-gated + parity-tested as the
#                         documented negative result


def _stem_kernel(x_ref, lhs_ref, scale_ref, bias_ref, o_ref,
                 *scratch, n_tb, n_j, h_rows, w_v, t_blk, u8_in=False,
                 u8_direct=False, pair_dot=False):
    """Grid (n_tb, n_j), j innermost (sequential; rows_ref[0] carries
    conv row 2j across j cells of the same tb block).

    w_v: valid w lanes per frame (160 for 480-wide inputs). Frames pack
    TIGHT in the dot's N dim (8 x w_v = 1280 lanes instead of 8 x 256) —
    the 256-lane slots of the r1 kernel wasted 37.5% of every matmul on
    pad lanes; the unaligned (w_v-offset) vector copies this needs are
    cheap next to the 1.6x dot shrink (measured 6.1 -> 4.5 ms/clip).

    u8_in: x is host-repacked uint8 planar (T4, H3, 32, w_v) — the block
    is DMA'd as raw bytes and cast to the compute dtype ONCE per cell in
    VMEM (ab_ref); the /255 scale is folded into lhs by the caller. This
    removes the whole XLA convert+pad stage (and its (T4, H3, 32, 256)
    compute-dtype HBM round trip) from the planar production path.

    u8_direct (with u8_in): skip the ab_ref block-cast pass; each rhs
    window copy casts u8 -> i32 -> dtype in the SAME vector pass as the
    copy (the band kernel's build_band already proved Mosaic fuses this).
    Removes ~0.7 GB/chunk of serial, non-overlapped VPU cast writes at the
    price of casting inside copies that are overlapped behind the dots
    anyway (r4 roofline: "building windows directly from u8").

    pair_dot: the two new conv rows of a cell go into ONE
    (192, 480) @ (480, 2*nlanes) matmul (rhs windows for both rows built
    side by side in the N dim) — half the dot-issue count for the same
    FLOPs; the dw-combine rolls then run per half. Tests the r4
    conclusion that the kernel is dot-serialization bound.
    """
    if u8_in and not u8_direct:
        a0_ref, ab_ref, rhs_ref, rows_ref, sem_ref = scratch
    else:
        a0_ref, rhs_ref, rows_ref, sem_ref = scratch
        ab_ref = None
    tb = pl.program_id(0)
    j = pl.program_id(1)
    k = tb * n_j + j
    n_cells = n_tb * n_j
    nlanes = t_blk * w_v

    def dma(slot, tb_, j_):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(tb_ * t_blk, t_blk + 4), pl.ds(2 * j_, 5)],
            a0_ref.at[slot],
            sem_ref.at[slot],
        )

    # double-buffered input DMA: this cell's copy was started by the
    # previous cell (or here for cell 0); start the next cell's now.
    @pl.when(k == 0)
    def _():
        dma(0, tb, j).start()

    @pl.when(k + 1 < n_cells)
    def _():
        nj = j + 1
        dma((k + 1) % 2, tb + nj // n_j, nj % n_j).start()

    dma(k % 2, tb, j).wait()
    slot = k % 2
    if u8_in and not u8_direct:
        # Mosaic has no unsigned->float cast; u8 -> i32 -> compute dtype
        # (values 0..255 are exact through every step)
        ab_ref[...] = a0_ref[slot].astype(jnp.int32).astype(ab_ref.dtype)

    def build_window(r, col0):
        """rhs window for conv row h = 2j + r at N columns [col0, col0 +
        nlanes) — one (K_DIM, w_v) copy per frame, cast fused if direct."""
        for u in range(t_blk):
            if u8_in and not u8_direct:
                v = ab_ref[u:u + 5, r:r + 3, :, :w_v]      # (5, 3, 32, w_v)
            else:
                v = a0_ref[slot, u:u + 5, r:r + 3, :, :w_v]
                if u8_in:
                    v = v.astype(jnp.int32).astype(rhs_ref.dtype)
            rhs_ref[:, col0 + w_v * u:col0 + w_v * (u + 1)] = (
                v.reshape(K_DIM, w_v))

    def finish_row(d, r):
        """(192, nlanes) f32 dot slab -> BN+ReLU'd conv row rows_ref[r]."""
        # combine the 3 dw taps: y[w] = d0[w] + d1[w+1] + d2[w+2]. The
        # rolls cross frame boundaries at lanes w_v-1/w_v-2 of each frame —
        # those are invalid conv outputs (w' <= w_v-3) no consumer reads.
        y = (d[0:64]
             + pltpu.roll(d[64:128], shift=nlanes - 1, axis=1)
             + pltpu.roll(d[128:192], shift=nlanes - 2, axis=1))
        y = jnp.maximum(y * scale_ref[...] + bias_ref[...], 0.0)
        rows_ref[r] = y.astype(rows_ref.dtype)

    def dot_cols(n_cols):
        return jax.lax.dot_general(
            lhs_ref[...], rhs_ref[:, :n_cols], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # explicit: a global jax_default_matmul_precision=highest would
            # otherwise request a multi-pass bf16 emulation Mosaic rejects
            precision=jax.lax.Precision.DEFAULT)

    def compute_row(r):
        """Conv row h = 2j + r for all t_blk frames -> rows_ref[r]."""
        build_window(r, 0)
        finish_row(dot_cols(nlanes), r)

    # pool row j needs conv rows {2j, 2j+1, 2j+2}; 2j is carried from the
    # previous cell except at j == 0 (h_rows guard: tail grids where the
    # last pool row would read past the valid conv rows never occur for
    # H=270 inputs, but keep the static structure honest for tests).
    @pl.when(j == 0)
    def _():
        compute_row(0)

    if pair_dot:
        build_window(1, 0)
        build_window(2, nlanes)
        d2 = dot_cols(2 * nlanes)                          # (192, 2*nlanes)
        finish_row(d2[:, :nlanes], 1)
        finish_row(d2[:, nlanes:], 2)
    else:
        compute_row(1)
        compute_row(2)
    del h_rows

    m = jnp.maximum(rows_ref[0], jnp.maximum(rows_ref[1], rows_ref[2]))
    # w-pool (k=3, s=2): max at every w; the pooled values live at even
    # lanes ("m-grid"). Decimation is deferred: layer 2 consumes the m-grid
    # directly as a w-dilated strided conv (see mgrid_conv2), so the only
    # remaining work here is unpacking the 8 tight frame runs to t-major
    # blocks (lanes >= w_v of each output slot are never written — the
    # m-grid contract already marks them unreadable).
    m = jnp.maximum(m, jnp.maximum(
        pltpu.roll(m, shift=nlanes - 1, axis=1),
        pltpu.roll(m, shift=nlanes - 2, axis=1)))
    m = m.astype(o_ref.dtype)
    for u in range(t_blk):
        o_ref[u, 0, :, :w_v] = m[:, w_v * u:w_v * (u + 1)]
    rows_ref[0] = rows_ref[2]  # carry conv row 2j+2 = 2(j+1) to cell j+1


def _stem_kernel_band(x_ref, lhs_ref, scale_ref, bias_ref, o_ref,
                      *scratch, n_tb, n_j, h_rows, w_v, t_blk,
                      u8_in=False):
    """Band-rotation stem kernel: the VPU-copy-optimal successor of
    `_stem_kernel` (see the ARCHITECTURE.md stem roofline — the window
    kernel is VPU-copy-bound, 2.05 GB of rhs window builds per chunk).

    Key ideas vs the window kernel:
      * the rhs keeps its (K=480, t_blk*w_v) geometry but is split into 3
        persistent 160-row K-BANDS, one per kh tap; band b holds input row
        r (with b = r % 3) in (dt, c) order. Advancing the conv row by 1
        invalidates exactly ONE band, so each row rebuilds 160 rhs rows
        instead of 480 — 3x less VPU copy traffic (the measured binder).
      * the dot stays ONE dense K=480 matmul: lhs_ref holds 3
        phase-rotated weight layouts (built by `_rotate_lhs`) and output
        row h uses lhs_ref[h % 3], whose K-bands match the rotated band
        positions. Same issued FLOPs as the window kernel.
      * steady-state cells DMA only the 2 NEW input rows (2j+3, 2j+4)
        instead of the 5-row window — the 2.5x h-halo of the input DMA
        drops to ~1x (j == 0 cells fetch the initial 5 rows).
      * the u8 cast happens inside the band build on exactly the rows
        read (no full-block u8 -> compute-dtype scratch pass).

    Grid and pool-carry semantics are identical to `_stem_kernel`
    (grid (n_tb, n_j), j innermost; rows_ref[0] carries conv row 2j).
    """
    init_ref, step_ref, rhs_ref, rows_ref, sem_i, sem_s = scratch
    tb = pl.program_id(0)
    j = pl.program_id(1)
    k = tb * n_j + j
    n_cells = n_tb * n_j
    nlanes = t_blk * w_v

    def dma_init(slot, tb_):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(tb_ * t_blk, t_blk + 4), pl.ds(0, 5)],
            init_ref.at[slot], sem_i.at[slot])

    def dma_step(slot, tb_, j_):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(tb_ * t_blk, t_blk + 4), pl.ds(2 * j_ + 3, 2)],
            step_ref.at[slot], sem_s.at[slot])

    # depth-1 prefetch: cell k starts cell k+1's fetch before computing.
    @pl.when(k == 0)
    def _():
        dma_init(0, 0).start()

    @pl.when(jnp.logical_and(k + 1 < n_cells, j + 1 < n_j))
    def _():
        dma_step((j + 1) % 2, tb, j + 1).start()

    @pl.when(jnp.logical_and(k + 1 < n_cells, j + 1 >= n_j))
    def _():
        dma_init((tb + 1) % 2, tb + 1).start()

    @pl.when(j == 0)
    def _():
        dma_init(tb % 2, tb).wait()

    @pl.when(j > 0)
    def _():
        dma_step(j % 2, tb, j).wait()

    def build_band(src_ref, slot, local_r, band):
        """rhs band `band` (traced 0..2) <- input row `local_r` (static)
        of src_ref[slot]: (5 dt, C_PAD, w_v) per frame -> (160, w_v)."""
        for u in range(t_blk):
            v = src_ref[slot, u:u + 5, local_r, :, :w_v]
            if u8_in:
                # Mosaic has no unsigned->float cast; u8 -> i32 -> dtype
                v = v.astype(jnp.int32).astype(rhs_ref.dtype)
            rhs_ref[pl.ds(band * K_BAND, K_BAND),
                    u * w_v:(u + 1) * w_v] = v.reshape(K_BAND, w_v)

    def dot_row(phase, out_r):
        """Output conv row with h % 3 == phase (traced) -> rows_ref[out_r];
        all 3 rhs bands must hold rows h, h+1, h+2."""
        d = jax.lax.dot_general(
            lhs_ref[phase], rhs_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # (192, nlanes)
        y = (d[0:64]
             + pltpu.roll(d[64:128], shift=nlanes - 1, axis=1)
             + pltpu.roll(d[128:192], shift=nlanes - 2, axis=1))
        y = jnp.maximum(y * scale_ref[...] + bias_ref[...], 0.0)
        rows_ref[out_r] = y.astype(rows_ref.dtype)

    @pl.when(j == 0)
    def _():
        slot = tb % 2
        # rows 0..2 fill the three bands (r % 3 == band), then each next
        # row rebuilds exactly one band; phases at j == 0 are static.
        build_band(init_ref, slot, 0, 0)
        build_band(init_ref, slot, 1, 1)
        build_band(init_ref, slot, 2, 2)
        dot_row(0, 0)                     # conv row 0
        build_band(init_ref, slot, 3, 0)  # row 3 -> band 0
        dot_row(1, 1)                     # conv row 1
        build_band(init_ref, slot, 4, 1)  # row 4 -> band 1
        dot_row(2, 2)                     # conv row 2

    @pl.when(j > 0)
    def _():
        slot = j % 2
        # conv rows 2j+1, 2j+2; new input rows 2j+3 (local 0, band
        # (2j+3) % 3 = 2j % 3) and 2j+4 (local 1, band (2j+1) % 3)
        build_band(step_ref, slot, 0, jnp.remainder(2 * j, 3))
        dot_row(jnp.remainder(2 * j + 1, 3), 1)
        build_band(step_ref, slot, 1, jnp.remainder(2 * j + 1, 3))
        dot_row(jnp.remainder(2 * j + 2, 3), 2)

    del h_rows
    m = jnp.maximum(rows_ref[0], jnp.maximum(rows_ref[1], rows_ref[2]))
    m = jnp.maximum(m, jnp.maximum(
        pltpu.roll(m, shift=nlanes - 1, axis=1),
        pltpu.roll(m, shift=nlanes - 2, axis=1)))
    m = m.astype(o_ref.dtype)
    for u in range(t_blk):
        o_ref[u, 0, :, :w_v] = m[:, w_v * u:w_v * (u + 1)]
    rows_ref[0] = rows_ref[2]  # carry conv row 2j+2 = 2(j+1) to cell j+1


def _rotate_lhs(lhs):
    """(192, 480) with K order (dt, dh, c) -> (3, 192, 480) phase-rotated
    for the band kernel: phase p places kh tap dh at K-band (dh + p) % 3
    with in-band order (dt, c), matching the band that holds input row
    h + dh when h % 3 == p."""
    idx = np.arange(K_DIM)
    dt, rem = idx // 96, idx % 96
    dh, c = rem // C_PAD, rem % C_PAD
    rots = []
    for p in range(3):
        newk = ((dh + p) % 3) * K_BAND + dt * C_PAD + c
        perm = np.empty(K_DIM, np.int64)
        perm[newk] = idx
        rots.append(lhs[:, perm])
    return jnp.stack(rots)


def stem_kernel_params(blk, eps: float = 1e-5):
    """Fold the stem conv kernel + BatchNorm into kernel operands.

    blk: {"conv": {kernel (5,7,7,3,64), bias (64,)}, "bn": {...}} — the
    net_vid[0] block (reference models/gestsync.py:35-45).
    Returns (lhs (192, 480), scale (64, 1) f32, bias (64, 1) f32).
    """
    from jegal_tpu.models.gestsync import _s2d_kernel

    k3 = _s2d_kernel(blk["conv"]["kernel"], 3)   # (5, 3, 3, 27, 64)
    k3 = jnp.pad(k3, ((0, 0), (0, 0), (0, 0), (0, C_PAD - k3.shape[3]),
                      (0, 0)))
    # lhs rows (dw, o); K cols (dt, dh, c) — matches the rhs window layout
    lhs = jnp.concatenate(
        [k3[:, :, dw].reshape(K_DIM, 64).T for dw in range(3)], axis=0)

    bn = blk["bn"]
    scale = (bn["scale"].astype(jnp.float32)
             * jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps))
    bias = bn["bias"].astype(jnp.float32) - bn["mean"].astype(jnp.float32) * scale
    cb = blk["conv"].get("bias")
    if cb is not None:
        bias = bias + cb.astype(jnp.float32) * scale
    return lhs, scale[:, None], bias[:, None]


def s2d_lanes(frames):
    """(T4, H, W, 3) float -> (T4, H/3, 32, W_PAD) with w in lanes.

    Channel order matches gestsync._s2d_kernel: c = (ri*3 + rj)*3 + ch.
    """
    t4, h, w, c = frames.shape
    assert h % 3 == 0 and w % 3 == 0 and c == 3
    # two-step form (measured ~25% faster than the one-shot 6D transpose):
    # merge (w3, rj*3+ch), swap innermost, fold ri out of the row dim
    x = frames.reshape(t4, h, w // 3, 9).transpose(0, 1, 3, 2)
    x = x.reshape(t4, h // 3, 27, w // 3)
    return jnp.pad(x, ((0, 0), (0, 0), (0, C_PAD - 27), (0, SLOT - w // 3)))


def stem_mgrid(frames, lhs, scale, bias, interpret: bool = False):
    """frames (T4, H, W, 3) [T4 = t_out + 4] -> m-grid (t_out, J, 64, SLOT).

    The m-grid holds the pooled stem output with channels in sublanes and
    the w axis UNDECIMATED in lanes: pooled value for w' sits at lane 2*w'
    (lanes >= 2*w_pool are garbage, never to be read).
    """
    return stem_mgrid_x(s2d_lanes(frames), lhs, scale, bias,
                        w_valid=frames.shape[2] // 3, interpret=interpret)


def stem_mgrid_x(x, lhs, scale, bias, w_valid: int = 160,
                 interpret: bool = False, impl: str | None = None,
                 pair_dot: bool | None = None):
    """Pre-repacked entry: x (T4, H3, 32, SLOT) as produced by s2d_lanes /
    ops.video.mask_frames_s2d (which fuses the repack into the masking
    pass) -> m-grid (t_out, J, 64, SLOT).

    w_valid: valid w lanes per frame in x (w // 3 of the raw frames; 160
    for the 480-wide production geometry).
    impl: 'window' (full rhs window rebuilt per conv row; the default —
    measured fastest on chip) | 'band' (rotating-band rhs, 3x less window
    build traffic but ~8% slower measured; kept as the documented
    alternative decomposition — see _stem_kernel_band).
    pair_dot: one dot for both new conv rows (see _stem_kernel);
    None -> module default STEM_PAIR_DOT."""
    impl = impl or STEM_IMPL
    pair_dot = STEM_PAIR_DOT if pair_dot is None else pair_dot
    t_out = x.shape[0] - 4
    h_in = x.shape[1]                       # conv-domain h rows available
    kh = 3                                  # block-space kernel extent
    h_rows = h_in - kh + 1                  # conv output rows
    n_j = (h_rows - 3) // 2 + 1             # pooled h rows
    # 4-byte dtypes double every VMEM scratch buffer; halve the frame
    # packing so the kernel stays inside the ~18 MB scoped VMEM stack
    # (observed: f32 @ t_blk=16 needs 18.75 MB and fails to compile)
    t_blk = T_BLK if jnp.dtype(x.dtype).itemsize <= 2 else T_BLK // 2
    n_tb = -(-t_out // t_blk)
    t4_pad = n_tb * t_blk + 4

    x = jnp.pad(x, ((0, t4_pad - x.shape[0]), (0, 0), (0, 0), (0, 0)))

    if impl == "band":
        kernel = functools.partial(_stem_kernel_band, n_tb=n_tb, n_j=n_j,
                                   h_rows=h_rows, w_v=w_valid, t_blk=t_blk)
        lhs_op = _rotate_lhs(lhs).astype(x.dtype)
        lhs_spec = pl.BlockSpec((3, M_DW, K_DIM), lambda tb, j: (0, 0, 0))
        scratch = [
            pltpu.VMEM((2, t_blk + 4, 5, C_PAD, SLOT), x.dtype),
            pltpu.VMEM((2, t_blk + 4, 2, C_PAD, SLOT), x.dtype),
            pltpu.VMEM((K_DIM, t_blk * w_valid), x.dtype),
            # f32: Mosaic's lane rotate (the w-pool shifts) is 32-bit only
            pltpu.VMEM((3, 64, t_blk * w_valid), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(_stem_kernel, n_tb=n_tb, n_j=n_j,
                                   h_rows=h_rows, w_v=w_valid, t_blk=t_blk,
                                   pair_dot=pair_dot)
        lhs_op = lhs.astype(x.dtype)
        lhs_spec = pl.BlockSpec((M_DW, K_DIM), lambda tb, j: (0, 0))
        scratch = [
            pltpu.VMEM((2, t_blk + 4, 5, C_PAD, SLOT), x.dtype),
            pltpu.VMEM((K_DIM, (2 if pair_dot else 1) * t_blk * w_valid),
                       x.dtype),
            pltpu.VMEM((3, 64, t_blk * w_valid), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(n_tb, n_j),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            lhs_spec,
            pl.BlockSpec((64, 1), lambda tb, j: (0, 0)),
            pl.BlockSpec((64, 1), lambda tb, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t_blk, 1, 64, SLOT),
                               lambda tb, j: (tb, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tb * t_blk, n_j, 64, SLOT),
                                       x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, lhs_op, scale, bias)
    return out[:t_out]


def stem_mgrid_planar(xp, lhs, scale, bias, dtype=jnp.bfloat16,
                      interpret: bool = False, impl: str | None = None,
                      u8_direct: bool | None = None,
                      pair_dot: bool | None = None):
    """m-grid from HOST-repacked uint8 planar input — the production entry.

    xp: (T4, H3, 27, w_v) uint8 as emitted by host.media.s2d_repack
    (C++ jegal_s2d_repack: s2d block 3, face-masked, raw 0..255 bytes).
    One XLA pad op brings the bytes to the kernel's (C_PAD, SLOT) geometry
    (Mosaic DMA requires 128-aligned lane extents, so the compact 160-lane
    form cannot be DMA'd directly); the kernel then DMAs uint8, casts to
    `dtype` ONCE per cell in VMEM, and the /255 normalization is folded
    into lhs (the conv is linear: conv(x/255, W) = conv(x, W/255)). The
    old pre-stem XLA stage materialized the full (T4, H3, 32, SLOT)
    compute-dtype tensor (~219 MB/clip written + re-read); this path
    round-trips the same geometry in uint8 (2x less traffic) and spends no
    VPU work on convert outside the kernel. -> (t_out, J, 64, SLOT).
    """
    impl = impl or STEM_IMPL
    u8_direct = STEM_U8_DIRECT if u8_direct is None else u8_direct
    pair_dot = STEM_PAIR_DOT if pair_dot is None else pair_dot
    assert xp.dtype == jnp.uint8 and xp.shape[2] <= C_PAD, xp.shape
    t_out = xp.shape[0] - 4
    h_in = xp.shape[1]
    w_v = xp.shape[3]
    h_rows = h_in - 3 + 1
    n_j = (h_rows - 3) // 2 + 1
    t_blk = T_BLK if jnp.dtype(dtype).itemsize <= 2 else T_BLK // 2
    n_tb = -(-t_out // t_blk)
    t4_pad = n_tb * t_blk + 4

    xp = jnp.pad(xp, ((0, t4_pad - xp.shape[0]), (0, 0),
                      (0, C_PAD - xp.shape[2]), (0, SLOT - w_v)))
    lhs = (lhs.astype(jnp.float32) / 255.0).astype(dtype)

    if impl == "band":
        kernel = functools.partial(_stem_kernel_band, n_tb=n_tb, n_j=n_j,
                                   h_rows=h_rows, w_v=w_v, t_blk=t_blk,
                                   u8_in=True)
        lhs_op = _rotate_lhs(lhs)
        lhs_spec = pl.BlockSpec((3, M_DW, K_DIM), lambda tb, j: (0, 0, 0))
        scratch = [
            pltpu.VMEM((2, t_blk + 4, 5, C_PAD, SLOT), jnp.uint8),
            pltpu.VMEM((2, t_blk + 4, 2, C_PAD, SLOT), jnp.uint8),
            pltpu.VMEM((K_DIM, t_blk * w_v), dtype),
            pltpu.VMEM((3, 64, t_blk * w_v), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(_stem_kernel, n_tb=n_tb, n_j=n_j,
                                   h_rows=h_rows, w_v=w_v, t_blk=t_blk,
                                   u8_in=True, u8_direct=u8_direct,
                                   pair_dot=pair_dot)
        lhs_op = lhs
        lhs_spec = pl.BlockSpec((M_DW, K_DIM), lambda tb, j: (0, 0))
        scratch = [
            pltpu.VMEM((2, t_blk + 4, 5, C_PAD, SLOT), jnp.uint8),
            *([] if u8_direct else
              [pltpu.VMEM((t_blk + 4, 5, C_PAD, SLOT), dtype)]),
            pltpu.VMEM((K_DIM, (2 if pair_dot else 1) * t_blk * w_v),
                       dtype),
            pltpu.VMEM((3, 64, t_blk * w_v), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(n_tb, n_j),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            lhs_spec,
            pl.BlockSpec((64, 1), lambda tb, j: (0, 0)),
            pl.BlockSpec((64, 1), lambda tb, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t_blk, 1, 64, SLOT),
                               lambda tb, j: (tb, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tb * t_blk, n_j, 64, SLOT),
                                       dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, lhs_op, scale, bias)
    return out[:t_out]


def mgrid_conv2(m, kernel, w_pool):
    """VGG block-2 conv reading the m-grid directly (no decimation pass).

    m: (T, J, 64, SLOT) m-grid; kernel: (5, 5, 64, C2) HWIO (the reference
    conv2 k(1,5,5) s(1,2,2) p0, models/gestsync.py:47-53, temporal k=1).
    The stride-2 w decimation is folded in as rhs_dilation=2 / stride=4 on
    the m-grid lanes. Returns NHWC (T, J2, W2, C2) — downstream blocks
    proceed in the standard layout.
    """
    w2 = (w_pool - kernel.shape[1]) // 2 + 1
    lanes = 4 * (w2 - 1) + 2 * (kernel.shape[1] - 1) + 1
    return jax.lax.conv_general_dilated(
        m[:, :, :, :lanes], kernel, window_strides=(2, 4),
        padding=[(0, 0), (0, 0)], rhs_dilation=(1, 2),
        dimension_numbers=("NHCW", "HWIO", "NHWC"))


def _compaction_matrix(w_pool: int, slot: int) -> np.ndarray:
    """(slot, w_pool) 0/1: column w' selects m-grid lane 2*w' — the
    stride-2 pooled-lane decimation as an MXU matmul (selection of bf16
    values through an f32-accumulating dot is exact; lane gathers are not
    vectorizable on TPU, selection matmuls are)."""
    s = np.zeros((slot, w_pool), np.float32)
    for wp in range(w_pool):
        s[2 * wp, wp] = 1.0
    return s


def mgrid_conv2_dense(m, blk2, w_pool: int):
    """VGG block-2 conv+bias+BN+ReLU from the m-grid via densification.

    Measured-fastest block-2 formulation on chip (see ARCHITECTURE.md perf
    ledger): (1) compact the m-grid's dilated pooled lanes to a dense
    (T, J, w_pool, 64) NHWC tensor with ONE selection matmul, then (2) run
    the stride-2 conv as a space-to-depth block-2 stride-1 conv (K=3*3*256
    dense contraction — the stem's own trick, models/gestsync.py:110-140).
    Pure XLA, so it is also the default on CPU/GPU; `mgrid_conv2` (dilated)
    stays the parity oracle. Reference semantics: conv2 k(1,5,5) s(1,2,2)
    p0 + bn2 + relu (reference models/gestsync.py:47-53).
    """
    from jegal_tpu.core.layers import batch_norm_inference
    from jegal_tpu.models.gestsync import _s2d_kernel, _space_to_depth

    t, n_j, c1, slot = m.shape
    kernel = blk2["conv"]["kernel"][0]              # (5, 5, 64, C2)
    kh, kw = kernel.shape[:2]
    # slice to the lanes actually read BEFORE the selection dot: m-grid
    # lanes >= w_valid hold uninitialized VMEM garbage, and 0 * NaN = NaN
    # would poison the matmul accumulation (the dilated oracle slices too)
    lanes = 2 * (w_pool - 1) + 1
    s_cmp = jnp.asarray(_compaction_matrix(w_pool, lanes)).astype(m.dtype)
    d = jax.lax.dot_general(m[..., :lanes], s_cmp, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    x = d.astype(m.dtype).transpose(0, 1, 3, 2)     # (T, J, w_pool, 64)
    xs = _space_to_depth(x[:, None], 2)             # (T, 1, Jc, Wc, 4*64)
    ks = _s2d_kernel(kernel[None], 2)[0]            # (3, 3, 4*64, C2)
    y = jax.lax.conv_general_dilated(
        xs.reshape(xs.shape[0], *xs.shape[2:]), ks,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y[:, : (n_j - kh) // 2 + 1, : (w_pool - kw) // 2 + 1]
    if blk2["conv"].get("bias") is not None:
        y = y + blk2["conv"]["bias"]
    return jax.nn.relu(batch_norm_inference(blk2["bn"], y.astype(m.dtype)))


def fused_stem_pool(frames, lhs, scale, bias, interpret: bool = False):
    """frames (T4, H, W, 3) -> pooled stem output (t_out, J, W_pool, 64).

    Numerically equivalent (modulo f32-vs-bf16 accumulation) to
    conv3d(k(5,7,7), s(1,3,3)) + BN + ReLU + maxpool((1,3,3), (1,2,2)).
    Parity/test entry point — production (gestsync.conv_tokens) keeps the
    m-grid and feeds layer 2 via mgrid_conv2 instead of paying this
    decimation relayout.
    """
    w_in = frames.shape[2] // 3
    w_pool = (w_in - 2 - 3) // 2 + 1
    out = stem_mgrid(frames, lhs, scale, bias, interpret=interpret)
    out = out[:, :, :, 0:2 * w_pool:2]               # (t, j, 64, w)
    return out.transpose(0, 1, 3, 2)                 # (t, j, w, 64)
