"""Parity tests for core layers vs torch (and the reference implementation
where importable)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from jegal_tpu.core import layers as L
from jegal_tpu.convert import torch_import as C

from oracles import reference_available, ref_modules, to_numpy

TOL = dict(rtol=1e-5, atol=1e-5)


def test_linear_parity(rng):
    t = nn.Linear(17, 23)
    x = rng.standard_normal((4, 9, 17)).astype(np.float32)
    want = to_numpy(t(torch.from_numpy(x)))
    got = L.linear(C.linear_from_torch(t.state_dict(), ""), jnp.asarray(x))
    # state_dict keys are 'weight'/'bias' with empty prefix -> '.weight'
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_std_layer_norm_parity(rng):
    t = nn.LayerNorm(32)
    with torch.no_grad():
        t.weight.uniform_(-1, 1)
        t.bias.uniform_(-1, 1)
    x = rng.standard_normal((3, 5, 32)).astype(np.float32)
    want = to_numpy(t(torch.from_numpy(x)))
    p = {"scale": jnp.asarray(to_numpy(t.weight)), "bias": jnp.asarray(to_numpy(t.bias))}
    got = L.std_layer_norm(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_ref_layer_norm_parity(rng):
    m = ref_modules()
    t = m.LayerNorm(48)
    with torch.no_grad():
        t.a_2.uniform_(0.5, 1.5)
        t.b_2.uniform_(-0.5, 0.5)
    x = rng.standard_normal((2, 7, 48)).astype(np.float32) * 3
    want = to_numpy(t(torch.from_numpy(x)))
    p = C.layer_norm_from_torch(t.state_dict(), "")
    # fix prefixless lookup
    got = L.ref_layer_norm(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_batch_norm_inference_parity(rng):
    t = nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        t.weight.uniform_(0.5, 1.5)
        t.bias.uniform_(-0.5, 0.5)
        t.running_mean.uniform_(-1, 1)
        t.running_var.uniform_(0.5, 2.0)
    x = rng.standard_normal((2, 6, 5, 7)).astype(np.float32)
    want = to_numpy(t(torch.from_numpy(x)))  # NCHW
    p = C.batch_norm_from_torch(t.state_dict(), "")
    got = L.batch_norm_inference(p, jnp.asarray(x.transpose(0, 2, 3, 1)))  # NHWC
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4)


def test_conv2d_parity(rng):
    t = nn.Conv2d(3, 8, kernel_size=(3, 5), stride=(2, 3), padding=(1, 2))
    x = rng.standard_normal((2, 3, 17, 23)).astype(np.float32)
    want = to_numpy(t(torch.from_numpy(x)))
    p = C.conv2d_from_torch(t.state_dict(), "")
    got = L.conv2d(p, jnp.asarray(x.transpose(0, 2, 3, 1)), stride=(2, 3), padding=(1, 2))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4)


def test_conv3d_parity(rng):
    t = nn.Conv3d(2, 4, kernel_size=(5, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))
    x = rng.standard_normal((1, 2, 9, 12, 14)).astype(np.float32)
    want = to_numpy(t(torch.from_numpy(x)))
    p = C.conv3d_from_torch(t.state_dict(), "")
    got = L.conv3d(p, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                   stride=(1, 2, 2), padding=(0, 1, 1))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), want, rtol=1e-4, atol=1e-4)


def test_max_pool_parity(rng):
    x = rng.standard_normal((2, 4, 11, 13)).astype(np.float32)
    want = to_numpy(nn.MaxPool2d(kernel_size=(3, 3), stride=(2, 2))(torch.from_numpy(x)))
    got = L.max_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), kernel=(3, 3), stride=(2, 2))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, **TOL)

    x3 = rng.standard_normal((1, 3, 5, 11, 13)).astype(np.float32)
    want3 = to_numpy(nn.MaxPool3d(kernel_size=(1, 3, 3), stride=(1, 2, 2))(torch.from_numpy(x3)))
    got3 = L.max_pool3d(jnp.asarray(x3.transpose(0, 2, 3, 4, 1)), kernel=(1, 3, 3), stride=(1, 2, 2))
    np.testing.assert_allclose(np.asarray(got3).transpose(0, 4, 1, 2, 3), want3, **TOL)
