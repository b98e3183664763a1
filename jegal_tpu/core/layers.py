"""Pure-JAX NN primitives with exact numerics parity to the reference.

Parameters are plain pytrees (nested dicts of jnp arrays) in JAX-friendly
layouts; checkpoint converters (jegal_tpu.convert) handle the layout
transposes from torch:

  linear:    {"kernel": (in, out), "bias": (out,)}        y = x @ kernel + bias
  layernorm: {"scale": (d,), "bias": (d,)}
  batchnorm: {"scale","bias","mean","var"}  (inference statistics)
  conv2d:    {"kernel": HWIO, "bias": (O,)}               data NHWC
  conv3d:    {"kernel": DHWIO, "bias": (O,)}              data NDHWC

Numerics notes (behavioral contract of the reference implementation):
  * `ref_layer_norm` replicates the reference's nonstandard LayerNorm
    (reference models/modules.py:24-35): it normalizes by the
    Bessel-corrected standard deviation (ddof=1) and divides by
    (std + eps), NOT sqrt(var + eps). Checkpoints were trained with this;
    it must not be "fixed".
  * `std_layer_norm` is standard torch nn.LayerNorm (biased variance,
    sqrt(var + eps), eps=1e-5) used inside the gesture input projection
    (reference models/jegal.py:25-28).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Dense / norm layers
# ---------------------------------------------------------------------------

def linear(params, x):
    """y = x @ kernel + bias. kernel: (in, out)."""
    y = jnp.dot(x, params["kernel"], preferred_element_type=x.dtype)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"]
    return y


def mlp(params_list, x, activation=jax.nn.relu):
    """Linear -> act -> Linear -> act ... -> Linear over a list of linear params."""
    n = len(params_list)
    for i, p in enumerate(params_list):
        x = linear(p, x)
        if i != n - 1:
            x = activation(x)
    return x


def ref_layer_norm(params, x, eps: float = 1e-6):
    """Reference-parity LayerNorm: (x - mean) / (std_bessel + eps) * a + b.

    Matches the reference's custom LayerNorm (models/modules.py:32-35):
    torch's `x.std(-1)` is Bessel-corrected (ddof=1), and the denominator is
    (std + eps), not sqrt(var + eps).
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / (n - 1)
    std = jnp.sqrt(var)
    return params["scale"] * (x - mean) / (std + eps) + params["bias"]


def std_layer_norm(params, x, eps: float = 1e-5):
    """Standard LayerNorm (torch nn.LayerNorm parity): biased variance."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return params["scale"] * y + params["bias"]


def batch_norm_inference(params, x, eps: float = 1e-5):
    """BatchNorm in inference mode over the trailing channel axis (NHWC/NDHWC).

    Folds running statistics into a single scale/shift so XLA fuses it into
    the adjacent conv.
    """
    inv = jax.lax.rsqrt(params["var"] + eps) * params["scale"]
    return x * inv + (params["bias"] - params["mean"] * inv)


# ---------------------------------------------------------------------------
# Convolutions (channels-last layouts: the TPU-native choice)
# ---------------------------------------------------------------------------

def _norm_tuple(v, n: int) -> tuple:
    if isinstance(v, (tuple, list)):
        assert len(v) == n, (v, n)
        return tuple(v)
    return (v,) * n


def conv2d(params, x, stride=(1, 1), padding=(0, 0)):
    """2-D convolution. x: NHWC, kernel: HWIO, symmetric zero padding."""
    stride = _norm_tuple(stride, 2)
    padding = _norm_tuple(padding, 2)
    pad = [(p, p) for p in padding]
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=stride,
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"]
    return y


def conv3d(params, x, stride=(1, 1, 1), padding=(0, 0, 0)):
    """3-D convolution. x: NDHWC, kernel: DHWIO, symmetric zero padding."""
    stride = _norm_tuple(stride, 3)
    padding = _norm_tuple(padding, 3)
    pad = [(p, p) for p in padding]
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=stride,
        padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"]
    return y


def max_pool2d(x, kernel=(2, 2), stride=(2, 2)):
    """Max pool, NHWC, VALID (torch ceil_mode=False parity)."""
    kernel = _norm_tuple(kernel, 2)
    stride = _norm_tuple(stride, 2)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) + kernel + (1,),
        window_strides=(1,) + stride + (1,),
        padding="VALID",
    )


def max_pool3d(x, kernel=(1, 2, 2), stride=(1, 2, 2)):
    """Max pool, NDHWC, VALID (torch ceil_mode=False parity)."""
    kernel = _norm_tuple(kernel, 3)
    stride = _norm_tuple(stride, 3)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) + kernel + (1,),
        window_strides=(1,) + stride + (1,),
        padding="VALID",
    )


# ---------------------------------------------------------------------------
# Parameter initializers (for from-scratch training / tests)
# ---------------------------------------------------------------------------

def init_linear(key, d_in: int, d_out: int, dtype=jnp.float32):
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both."""
    kk, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "kernel": jax.random.uniform(kk, (d_in, d_out), dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def init_layer_norm(d: int, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_batch_norm(d: int, dtype=jnp.float32):
    return {
        "scale": jnp.ones((d,), dtype),
        "bias": jnp.zeros((d,), dtype),
        "mean": jnp.zeros((d,), dtype),
        "var": jnp.ones((d,), dtype),
    }


def init_conv(key, kernel_shape: Sequence[int], dtype=jnp.float32):
    """torch convNd default init. kernel_shape is HWIO / DHWIO (I at -2, O at -1)."""
    kk, kb = jax.random.split(key)
    kernel_shape = tuple(kernel_shape)
    fan_in = int(np.prod(kernel_shape[:-1]))  # spatial * in_channels
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(kk, kernel_shape, dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (kernel_shape[-1],), dtype, -bound, bound),
    }
