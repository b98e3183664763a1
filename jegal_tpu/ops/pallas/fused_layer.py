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


def _attn_kernel(x_ref, wqkv_ref, wo_ref, bqkv_ref, bo_ref, g_ref, b_ref,
                 segm_ref, km_ref, o_ref, *,
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
    # q/k/v projections as ONE (d, 3d) dot (weights pre-concatenated by
    # the wrapper): one MXU pipeline fill instead of three at these small
    # row blocks; the d-wide slices below are lane-aligned views
    d = x.shape[-1]
    qkv = _dot(hc, wqkv_ref[...]) + bqkv_ref[...]
    q = qkv[:, :d]
    k = qkv[:, d:2 * d]
    v = qkv[:, 2 * d:]

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


def _erf_f32(x):
    """erf via Abramowitz & Stegun 7.1.26 (|abs err| <= 1.5e-7 — below f32
    resolution of the GELU output): Mosaic has no erf primitive."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + np.float32(0.3275911) * a)
    poly = t * (np.float32(0.254829592)
                + t * (np.float32(-0.284496736)
                       + t * (np.float32(1.421413741)
                              + t * (np.float32(-1.453152027)
                                     + t * np.float32(1.061405429)))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _act(h1, activation: str):
    """FFN nonlinearity in f32. 'relu' (GestSync/JEGAL stacks) or 'gelu'
    (exact erf form — HF BERT/XLM-R, hidden_act='gelu')."""
    if activation == "gelu":
        return h1 * 0.5 * (1.0 + _erf_f32(h1 * np.float32(2 ** -0.5)))
    return jnp.maximum(h1, 0.0)


def _ffn_kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, g_ref, b_ref, o_ref,
                acc_ref, h_ref, *, prenorm: bool, ln_kind: str, n_f: int,
                activation: str = "relu"):
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
    h1 = _act(h1, activation).astype(dt)
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


def _stack_kernel(x_ref, wqkv_ref, wo_ref, w1_ref, w2_ref, bqkv_ref, bo_ref,
                  b1_ref, b2_ref, g1_ref, be1_ref, g2_ref, be2_ref,
                  segm_ref, km_ref, o_ref, xs_ref, *,
                  heads: int, prenorm: bool, ln_kind: str, n_layers: int,
                  activation: str):
    """Whole encoder stack in ONE pallas_call: grid (row_blocks, L) with L
    innermost; each grid step runs one full layer (attn + FFN sublayers) on
    the row block held in VMEM scratch (f32) while Pallas streams the next
    layer's weights from HBM. Cuts 2L kernel launches (and 2L HBM round
    trips of the activations) to one launch whose weight DMA overlaps
    compute — the encoder stacks here are launch-bound at their tiny row
    counts (12L XLM-R at B=1,S=32: 1.4 ms as 24 sublayer calls)."""
    l = pl.program_id(1)
    dt = o_ref.dtype
    d = xs_ref.shape[-1]
    dk = d // heads
    scale = np.float32(1.0 / math.sqrt(dk))

    @pl.when(l == 0)
    def _():
        xs_ref[...] = x_ref[...].astype(jnp.float32)

    _dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    allowed = segm_ref[...] * km_ref[0]

    # --- attention sublayer ---
    x = xs_ref[...]
    g1 = g1_ref[0].astype(jnp.float32)
    be1 = be1_ref[0].astype(jnp.float32)
    h = _ln_f32(x, g1, be1, ln_kind) if prenorm else x
    hc = h.astype(dt)
    qkv = _dot(hc, wqkv_ref[0]) + bqkv_ref[0]
    outs = []
    for hh in range(heads):
        sl = slice(hh * dk, (hh + 1) * dk)
        qh = (qkv[:, sl] * scale).astype(dt)
        kh = qkv[:, d + hh * dk:d + (hh + 1) * dk].astype(dt)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        s = jnp.where(allowed == 0, np.float32(-1e9), s)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        outs.append(_dot(p, qkv[:, 2 * d + hh * dk:2 * d + (hh + 1) * dk]
                         .astype(dt)))
    a = jnp.concatenate(outs, axis=1).astype(dt)
    y = x + _dot(a, wo_ref[0]) + bo_ref[0]
    if not prenorm:
        y = _ln_f32(y, g1, be1, ln_kind)

    # --- FFN sublayer ---
    g2 = g2_ref[0].astype(jnp.float32)
    be2 = be2_ref[0].astype(jnp.float32)
    h = _ln_f32(y, g2, be2, ln_kind) if prenorm else y
    h1 = _dot(h.astype(dt), w1_ref[0]) + b1_ref[0]
    h1 = _act(h1, activation).astype(dt)
    y = y + _dot(h1, w2_ref[0]) + b2_ref[0]
    if not prenorm:
        y = _ln_f32(y, g2, be2, ln_kind)
    xs_ref[...] = y

    @pl.when(l == n_layers - 1)
    def _():
        o_ref[...] = y.astype(dt)


def _attn_sublayer(x, attn, norm, segm, kcols, *, heads, prenorm, ln_kind,
                   br, interpret):
    rp, d = x.shape
    grid = (rp // br,)
    const = lambda i: (0, 0)
    bspec = pl.BlockSpec((1, d), const)
    wqkv = jnp.concatenate([attn["q"]["kernel"], attn["k"]["kernel"],
                            attn["v"]["kernel"]], axis=1).astype(x.dtype)
    bqkv = jnp.concatenate([jnp.ravel(attn["q"]["bias"]),
                            jnp.ravel(attn["k"]["bias"]),
                            jnp.ravel(attn["v"]["bias"])])
    return pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads, prenorm=prenorm,
                          ln_kind=ln_kind),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((d, 3 * d), const),
            pl.BlockSpec((d, d), const),
            pl.BlockSpec((1, 3 * d), const),
            bspec, bspec, bspec,
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
    )(x, wqkv, attn["o"]["kernel"].astype(x.dtype),
      _row2(bqkv, jnp.float32),
      _row2(attn["o"]["bias"], jnp.float32),
      _row2(norm["scale"]), _row2(norm["bias"]), segm, kcols)


def _ffn_sublayer(x, ff, norm, *, prenorm, ln_kind, br, interpret,
                  activation="relu"):
    rp, d = x.shape
    dff = ff["w1"]["kernel"].shape[1]
    fb = min(_FF_BLOCK, dff)
    assert dff % fb == 0, (dff, fb)
    n_f = dff // fb
    const = lambda i, f: (0, 0)
    bspec = pl.BlockSpec((1, d), const)
    return pl.pallas_call(
        functools.partial(_ffn_kernel, prenorm=prenorm, ln_kind=ln_kind,
                          n_f=n_f, activation=activation),
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


def _stacked_weights(layers, dt):
    """Stack fused-layout layer dicts into per-array (L, ...) operands for
    the single-kernel stack (weights in compute dtype, biases/norms f32)."""
    def st(f, cast=None):
        arrs = [jnp.asarray(f(l)).astype(cast or dt) for l in layers]
        out = jnp.stack(arrs)
        # 1-D per-layer vectors (biases, norm params) carry a singleton
        # middle dim: Mosaic block shapes need the 2nd-to-last dim to tile
        # (block (1, 1, w) == array dims (1, w) per layer)
        return out[:, None] if out.ndim == 2 else out

    return dict(
        wqkv=st(lambda l: jnp.concatenate(
            [l["attn"]["q"]["kernel"], l["attn"]["k"]["kernel"],
             l["attn"]["v"]["kernel"]], axis=1)),
        wo=st(lambda l: l["attn"]["o"]["kernel"]),
        w1=st(lambda l: l["ff"]["w1"]["kernel"]),
        w2=st(lambda l: l["ff"]["w2"]["kernel"]),
        bqkv=st(lambda l: jnp.concatenate(
            [jnp.ravel(l["attn"]["q"]["bias"]),
             jnp.ravel(l["attn"]["k"]["bias"]),
             jnp.ravel(l["attn"]["v"]["bias"])]), jnp.float32),
        bo=st(lambda l: jnp.ravel(l["attn"]["o"]["bias"]), jnp.float32),
        b1=st(lambda l: jnp.ravel(l["ff"]["b1"] if "b1" in l["ff"]
                                  else l["ff"]["w1"]["bias"]), jnp.float32),
        b2=st(lambda l: jnp.ravel(l["ff"]["b2"] if "b2" in l["ff"]
                                  else l["ff"]["w2"]["bias"]), jnp.float32),
        g1=st(lambda l: l["norm1"]["scale"], jnp.float32),
        be1=st(lambda l: l["norm1"]["bias"], jnp.float32),
        g2=st(lambda l: l["norm2"]["scale"], jnp.float32),
        be2=st(lambda l: l["norm2"]["bias"], jnp.float32),
    )


def _stack_single(w, x, segm, kcols, *, heads, prenorm, ln_kind,
                  br, activation, interpret):
    """One pallas_call for the whole stack: grid (row_blocks, L). `w` is
    the _stacked_weights dict — pass a PRE-stacked one (roberta
    stack_layers' fused_ops) to keep the concat out of the jit graph."""
    rp, d = x.shape
    n_l = w["wqkv"].shape[0]
    dff = w["w1"].shape[-1]
    row = lambda i, l: (i, 0)
    lay3 = lambda i, l: (l, 0, 0)
    return pl.pallas_call(
        functools.partial(_stack_kernel, heads=heads, prenorm=prenorm,
                          ln_kind=ln_kind, n_layers=n_l,
                          activation=activation),
        grid=(rp // br, n_l),
        in_specs=[
            pl.BlockSpec((br, d), row),
            pl.BlockSpec((1, d, 3 * d), lay3),
            pl.BlockSpec((1, d, d), lay3),
            pl.BlockSpec((1, d, dff), lay3),
            pl.BlockSpec((1, dff, d), lay3),
            pl.BlockSpec((1, 1, 3 * d), lay3),
            pl.BlockSpec((1, 1, d), lay3),
            pl.BlockSpec((1, 1, dff), lay3),
            pl.BlockSpec((1, 1, d), lay3),
            pl.BlockSpec((1, 1, d), lay3),
            pl.BlockSpec((1, 1, d), lay3),
            pl.BlockSpec((1, 1, d), lay3),
            pl.BlockSpec((1, 1, d), lay3),
            pl.BlockSpec((br, br), lambda i, l: (0, 0)),
            pl.BlockSpec((1, 1, br), lambda i, l: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((br, d), row),
        out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((br, d), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w["wqkv"], w["wo"], w["w1"], w["w2"], w["bqkv"], w["bo"],
      w["b1"], w["b2"], w["g1"], w["be1"], w["g2"], w["be2"], segm, kcols)


def fused_encoder_stack(layers, x, seg: int, num_heads: int, *,
                        prenorm: bool, ln_kind: str, kmask=None,
                        interpret: bool = False, activation: str = "relu",
                        single_kernel: bool = False):
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
    # don't let the block outgrow the input: a B=1 S=32 text forward would
    # otherwise pad its 32 rows to one 336-target block (10x dead compute
    # in every dot and score matrix). Only when the shrunken block still
    # tiles sublanes (%8) — 21-token windows must keep the 336 packing.
    br = block_rows(seg)
    if r < br and r % 8 == 0:
        br = r
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

    if single_kernel or isinstance(layers, dict):
        # a pre-stacked operand dict (roberta fused_ops) only has the
        # single-kernel representation
        w = (layers if isinstance(layers, dict)
             else _stacked_weights(layers, x.dtype))
        x = _stack_single(w, x, segm, kcols, heads=num_heads,
                          prenorm=prenorm, ln_kind=ln_kind, br=br,
                          activation=activation, interpret=interpret)
        return x[:r]
    for layer in layers:
        x = _attn_sublayer(x, layer["attn"], layer["norm1"], segm, kcols,
                           heads=num_heads, prenorm=prenorm,
                           ln_kind=ln_kind, br=br, interpret=interpret)
        x = _ffn_sublayer(x, layer["ff"], layer["norm2"], prenorm=prenorm,
                          ln_kind=ln_kind, br=br, interpret=interpret,
                          activation=activation)
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


def fused_roberta_stack(layers, x, seg: int, num_heads: int, kmask=None,
                        interpret: bool = False):
    """BERT/XLM-R encoder layers (post-norm, std LN eps 1e-5, exact-GELU
    FFN) over (R, d) rows of contiguous `seg`-token sequences. `layers` are
    fused-layout dicts (models/roberta._fused_layout). Masking note: the
    kernel FILLS masked scores with -1e9 where HF ADDS finfo.min — after
    the softmax's max-subtraction both underflow to exactly 0, so outputs
    match HF (models/roberta.py:14-17) for every valid query row. Oracle:
    models/roberta.encoder_layer."""
    return fused_encoder_stack(layers, x, seg, num_heads,
                               prenorm=False, ln_kind="std", kmask=kmask,
                               interpret=interpret, activation="gelu")
