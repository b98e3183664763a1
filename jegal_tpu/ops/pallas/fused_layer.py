"""Fused transformer encoder sublayers as Pallas TPU kernels.

The encoder stacks in this pipeline run over small rows-times-d workloads
(the GestSync window head: N sliding windows of 21 tokens at d=512,
reference models/gestsync.py:148-162; the JEGAL gesture/text encoders:
T<=512 tokens at d=512/768, reference models/modules.py:11-131). Under XLA
each layer is ~15 small ops — QKV/out projections, head split/merge
transposes, a softmax over a tiny axis, two LayerNorms, the FFN pair — and
the measured device time sits at 20-70 TF/s, far off the stem kernel's
~113 TF/s, because the intermediates round-trip HBM between ops and the
transposes/softmax dominate at these shapes.

These kernels collapse each sublayer into one `pallas_call`:

  * `_attn_kernel`: LayerNorm (pre-norm) -> QKV matmuls -> per-head
    block-diagonal attention -> output projection -> residual add ->
    LayerNorm (post-norm), entirely in VMEM. Attention over independent
    segments (the 21-token windows / the per-sample T-token sequences) is
    computed as ONE masked (rows x rows) score matmul per head: segments
    never attend across, so a static segment mask plus the caller's
    key-validity mask reproduce the reference semantics
    (scores/sqrt(d_k), masked positions filled with -1e9 in f32 before
    softmax — models/modules.py:61-75) while keeping every matmul MXU-sized.
  * `_ffn_kernel`: LayerNorm -> W1 -> ReLU -> W2 -> residual -> LayerNorm,
    with the d_ff contraction blocked over an inner grid axis so the
    weights stream through VMEM (d_ff=3072 at f32 would not fit whole).

Both norm conventions are supported: the torch post-norm layer used by the
GestSync window transformer (std LayerNorm, eps 1e-5) and the pre-norm
"annotated transformer" layer used by JEGAL (the reference's nonstandard
Bessel-std LayerNorm, eps 1e-6 — see core/layers.ref_layer_norm).

Numerics: matmuls accumulate in f32 (operands in the input dtype), norms
and softmax in f32 — at least as accurate as the XLA path in bf16, and
bit-close in f32. Parity is pinned against core/transformer oracles in
interpret mode (tests/test_fused_layer.py) and on chip (slow suite).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# dispatch switch: "auto" (fused kernels on TPU, XLA elsewhere — decided at
# lowering time via jax.lax.platform_dependent at the call sites) or "off"
# (always the XLA oracle path; used to pin parity on chip)
_FUSED_IMPL = "auto"


def set_fused_impl(impl: str):
    global _FUSED_IMPL
    assert impl in ("auto", "off"), impl
    _FUSED_IMPL = impl


def enabled() -> bool:
    return _FUSED_IMPL == "auto"

# target rows per block: segments are packed into blocks of ~336 rows
# (16 windows x 21 tokens for the window head; 336 = 42 sublanes x 8) —
# big enough to feed the MXU, small enough that the f32 score matrix
# (336 x 336) and the FFN intermediates stay comfortably in VMEM.
_TARGET_ROWS = 336
_MAX_SEG = 512          # one segment must fit a single block
_FF_BLOCK = 1024        # d_ff contraction block (streams W1/W2 at d_ff 3072)


def block_rows(seg: int) -> int:
    """Rows per kernel block for segment length `seg` (whole segments)."""
    if seg > _MAX_SEG:
        raise ValueError(f"segment length {seg} > {_MAX_SEG}")
    return seg * max(1, _TARGET_ROWS // seg)


def fused_stack_ok(seg: int, d: int, num_heads: int) -> bool:
    """Shape gate for the fused path: whole segments must tile into
    8-sublane-aligned blocks and heads must split the lanes evenly."""
    if seg > _MAX_SEG or d % num_heads or d % 128:
        return False
    return block_rows(seg) % 8 == 0


def _ln_f32(x, g, b, kind: str):
    """LayerNorm in f32. kind: 'std' (torch nn.LayerNorm, biased var,
    rsqrt(var+1e-5)) or 'ref' (reference Bessel-std, /(std+1e-6)) — the two
    conventions in core/layers.py:56-75."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    cen = x - mean
    if kind == "ref":
        var = jnp.sum(cen * cen, axis=-1, keepdims=True) / (x.shape[-1] - 1)
        y = cen / (jnp.sqrt(var) + np.float32(1e-6))
    else:
        var = jnp.mean(cen * cen, axis=-1, keepdims=True)
        y = cen * jax.lax.rsqrt(var + np.float32(1e-5))
    return y * g + b


def _attn_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bq_ref, bk_ref,
                 bv_ref, bo_ref, g_ref, b_ref, segm_ref, km_ref, o_ref, *,
                 heads: int, prenorm: bool, ln_kind: str):
    dt = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    h = _ln_f32(x, g, b, ln_kind) if prenorm else x
    hc = h.astype(dt)

    # explicit DEFAULT precision on every kernel dot: a global
    # jax_default_matmul_precision=highest would request a multi-pass bf16
    # emulation Mosaic rejects (same note as ops/pallas/stem.py:104-106)
    _dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    q = _dot(hc, wq_ref[...]) + bq_ref[...]
    k = _dot(hc, wk_ref[...]) + bk_ref[...]
    v = _dot(hc, wv_ref[...]) + bv_ref[...]

    d = x.shape[-1]
    dk = d // heads
    scale = np.float32(1.0 / math.sqrt(dk))
    # 0/1 validity: same-segment AND key-valid (broadcast over query rows)
    allowed = segm_ref[...] * km_ref[0]

    outs = []
    for hh in range(heads):
        sl = slice(hh * dk, (hh + 1) * dk)
        qh = (q[:, sl] * scale).astype(dt)
        kh = k[:, sl].astype(dt)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        s = jnp.where(allowed == 0, np.float32(-1e9), s)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        outs.append(_dot(p, v[:, sl].astype(dt)))
    a = jnp.concatenate(outs, axis=1).astype(dt)
    y = x + _dot(a, wo_ref[...]) + bo_ref[...]
    if not prenorm:
        y = _ln_f32(y, g, b, ln_kind)
    o_ref[...] = y.astype(dt)


def _ffn_kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, g_ref, b_ref, o_ref,
                acc_ref, h_ref, *, prenorm: bool, ln_kind: str, n_f: int):
    f = pl.program_id(1)
    dt = x_ref.dtype

    _dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    if prenorm:
        # the f axis streams W1/W2 blocks over the SAME rows: norm the
        # block once at f == 0 into scratch instead of re-running the f32
        # LayerNorm (two reductions + rsqrt over br x d) on every W block
        @pl.when(f == 0)
        def _():
            h_ref[...] = _ln_f32(x_ref[...].astype(jnp.float32),
                                 g_ref[...].astype(jnp.float32),
                                 b_ref[...].astype(jnp.float32),
                                 ln_kind).astype(dt)

        hc = h_ref[...]
    else:
        hc = x_ref[...]  # post-norm: FFN reads the raw residual stream
    h1 = _dot(hc, w1_ref[...]) + b1_ref[...]
    h1 = jnp.maximum(h1, 0.0).astype(dt)
    part = _dot(h1, w2_ref[...])

    @pl.when(f == 0)
    def _():
        acc_ref[...] = part

    @pl.when(f > 0)
    def _():
        acc_ref[...] = acc_ref[...] + part

    @pl.when(f == n_f - 1)
    def _():
        y = x_ref[...].astype(jnp.float32) + acc_ref[...] + b2_ref[...]
        if not prenorm:
            y = _ln_f32(y, g_ref[...].astype(jnp.float32),
                        b_ref[...].astype(jnp.float32), ln_kind)
        o_ref[...] = y.astype(dt)


def _row2(a, dtype=None):
    a = jnp.asarray(a)
    return a.reshape(1, -1).astype(dtype or a.dtype)


def _attn_sublayer(x, attn, norm, segm, kcols, *, heads, prenorm, ln_kind,
                   br, interpret):
    rp, d = x.shape
    grid = (rp // br,)
    const = lambda i: (0, 0)
    wspec = pl.BlockSpec((d, d), const)
    bspec = pl.BlockSpec((1, d), const)
    return pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads, prenorm=prenorm,
                          ln_kind=ln_kind),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            wspec, wspec, wspec, wspec,
            bspec, bspec, bspec, bspec,
            bspec, bspec,
            pl.BlockSpec((br, br), const),
            # kcols is laid out (n_blocks, 1, br): the leading grid axis
            # lets each block carry a full (1, br) trailing tile (Mosaic
            # wants the last two dims %8/%128 or whole-array)
            pl.BlockSpec((1, 1, br), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, attn["q"]["kernel"].astype(x.dtype),
      attn["k"]["kernel"].astype(x.dtype),
      attn["v"]["kernel"].astype(x.dtype),
      attn["o"]["kernel"].astype(x.dtype),
      _row2(attn["q"]["bias"], jnp.float32),
      _row2(attn["k"]["bias"], jnp.float32),
      _row2(attn["v"]["bias"], jnp.float32),
      _row2(attn["o"]["bias"], jnp.float32),
      _row2(norm["scale"]), _row2(norm["bias"]), segm, kcols)


def _ffn_sublayer(x, ff, norm, *, prenorm, ln_kind, br, interpret):
    rp, d = x.shape
    dff = ff["w1"]["kernel"].shape[1]
    fb = min(_FF_BLOCK, dff)
    assert dff % fb == 0, (dff, fb)
    n_f = dff // fb
    const = lambda i, f: (0, 0)
    bspec = pl.BlockSpec((1, d), const)
    return pl.pallas_call(
        functools.partial(_ffn_kernel, prenorm=prenorm, ln_kind=ln_kind,
                          n_f=n_f),
        grid=(rp // br, n_f),
        in_specs=[
            pl.BlockSpec((br, d), lambda i, f: (i, 0)),
            pl.BlockSpec((d, fb), lambda i, f: (0, f)),
            pl.BlockSpec((fb, d), lambda i, f: (f, 0)),
            pl.BlockSpec((1, fb), lambda i, f: (0, f)),
            bspec, bspec, bspec,
        ],
        out_specs=pl.BlockSpec((br, d), lambda i, f: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((br, d), jnp.float32),
                        pltpu.VMEM((br, d), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, ff["w1"]["kernel"].astype(x.dtype), ff["w2"]["kernel"].astype(x.dtype),
      _row2(ff["b1"] if "b1" in ff else ff["w1"]["bias"], jnp.float32),
      _row2(ff["b2"] if "b2" in ff else ff["w2"]["bias"], jnp.float32),
      _row2(norm["scale"]), _row2(norm["bias"]))


def fused_encoder_stack(layers, x, seg: int, num_heads: int, *,
                        prenorm: bool, ln_kind: str, kmask=None,
                        interpret: bool = False):
    """Run a whole encoder stack over flattened segment rows.

    layers: list of layer pytrees ({"attn": {q,k,v,o}, "ff": {w1,w2},
    "norm1", "norm2"} — the core/transformer layout for both stack kinds).
    x: (R, d) rows, R a multiple of `seg` (segments contiguous).
    kmask: optional (R,) key-validity (nonzero = valid).

    Post-norm (prenorm=False): x = LN1(x + Attn(x)); x = LN2(x + FFN(x))
      — torch nn.TransformerEncoderLayer (core/transformer.py:217-222).
    Pre-norm  (prenorm=True):  x = x + Attn(LN1(x)); x = x + FFN(LN2(x))
      — the JEGAL layer (core/transformer.py:199-203); the stack's final
      norm is NOT applied here (caller's job).
    """
    r, d = x.shape
    assert r % seg == 0, (r, seg)
    br = block_rows(seg)
    rp = -(-r // br) * br
    if rp != r:
        x = jnp.pad(x, ((0, rp - r), (0, 0)))

    rows = np.arange(br)
    segm = jnp.asarray((rows[:, None] // seg) == (rows[None, :] // seg),
                       jnp.float32)
    if kmask is None:
        kcols = jnp.ones((rp // br, 1, br), jnp.float32)
    else:
        kcols = (kmask.reshape(-1) != 0).astype(jnp.float32)
        if rp != r:
            kcols = jnp.pad(kcols, (0, rp - r), constant_values=1.0)
        kcols = kcols.reshape(rp // br, 1, br)

    for layer in layers:
        x = _attn_sublayer(x, layer["attn"], layer["norm1"], segm, kcols,
                           heads=num_heads, prenorm=prenorm,
                           ln_kind=ln_kind, br=br, interpret=interpret)
        x = _ffn_sublayer(x, layer["ff"], layer["norm2"], prenorm=prenorm,
                          ln_kind=ln_kind, br=br, interpret=interpret)
    return x[:r]


def fused_torch_stack(stack, x, seg: int, num_heads: int,
                      interpret: bool = False):
    """torch_encoder_stack equivalent (post-norm, std LN) over (R, d) rows
    of contiguous `seg`-token segments. Oracle:
    core/transformer.torch_encoder_stack."""
    return fused_encoder_stack(stack["layers"], x, seg, num_heads,
                               prenorm=False, ln_kind="std",
                               interpret=interpret)


def fused_prenorm_stack(stack, x, seg: int, num_heads: int, kmask=None,
                        interpret: bool = False):
    """JEGAL pre-norm stack (ref LayerNorm) WITHOUT the final stack norm.
    Oracle: core/transformer.encoder_stack minus its trailing
    ref_layer_norm."""
    return fused_encoder_stack(stack["layers"], x, seg, num_heads,
                               prenorm=True, ln_kind="ref", kmask=kmask,
                               interpret=interpret)
