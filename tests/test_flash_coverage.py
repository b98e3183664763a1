"""Flash-attention dispatch coverage: which PRODUCTION branches hit the
Pallas kernel (VERDICT r1 item 9 — coverage honesty).

The auto gate (core/transformer._flash_ok) admits every power-of-two shape
bucket (T % 8 == 0, one <=128-row block or a multiple of 128) with
d_k % 64 == 0 on TPU. These tests trace the real model forwards with the
TPU check patched on and count kernel dispatches at trace time, asserting:

  * JEGAL gesture encoder — flash at every T bucket (32..512), d_k = 64
  * JEGAL text encoder — flash at every S bucket (16..256), d_k = 96
  * XLM-R encoder — dense BY DESIGN: it carries its own HF-parity
    additive-mask attention (models/roberta.py:66-82), not the reference's
    -1e9 fill semantics the kernel implements
  * GestSync 21-token window transformer — dense BY DESIGN (21 % 8 != 0;
    dispatch-bound at that size, the dense einsum fuses into the graph)
  * genuinely 2-D (Tq, Tk) masks — dense (kernel takes key-validity only)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jegal_tpu.core import transformer as T
from jegal_tpu.data.bucketing import S_BUCKETS, T_BUCKETS
from jegal_tpu.models import gestsync as G
from jegal_tpu.models import jegal as J
from jegal_tpu.ops.pallas import flash_attention as FA

import __graft_entry__ as GE


@pytest.fixture
def count_flash(monkeypatch):
    """Count kernel dispatches during tracing. The auto path defers the
    TPU-vs-other choice to lowering (jax.lax.platform_dependent), so the
    kernel branch is TRACED on every backend — a trace-time count tells
    exactly which graphs carry the kernel when lowered for TPU."""
    calls = []
    real = FA.flash_attention_diff

    def counting(q, k, v, mask, *a, **kw):
        calls.append(tuple(q.shape))
        return real(q, k, v, mask, *a, **kw)

    monkeypatch.setattr(FA, "flash_attention_diff", counting)
    return calls


@pytest.fixture(scope="module")
def models():
    return GE._models(jax.random.PRNGKey(0))


def test_gesture_encoder_hits_flash_at_every_bucket(count_flash, models):
    jparams, _, _ = models
    for t in T_BUCKETS:
        count_flash.clear()
        feats = jnp.zeros((1, t, 1024))
        mask = jnp.ones((1, t))
        jax.eval_shape(lambda f, m: J.forward_inference(
            jparams, None, use_v=True, use_t=False, use_a=False,
            visual_feats=f, visual_mask=m), feats, mask)
        # 6 encoder layers, every one on the kernel
        assert len(count_flash) == 6, (t, len(count_flash))
        assert all(s == (1, 8, t, 64) for s in count_flash)


def test_text_branch_coverage(count_flash, models):
    """The 3 JEGAL text layers (d_k = 96) hit the kernel; the XLM-R layers
    (own HF additive-mask attention) never do."""
    jparams, rparams, cfg = models
    for s in S_BUCKETS:
        if s > cfg.max_position_embeddings - 2:
            continue
        count_flash.clear()
        ids = jnp.ones((1, s), jnp.int32)
        mask = jnp.ones((1, s), jnp.float32)
        pool = jnp.zeros((1, 8, s))
        jax.eval_shape(lambda i, m, p: J.forward_inference(
            jparams, rparams, use_v=False, use_t=True, use_a=False,
            input_ids=i, text_mask=m, text_pool=p, roberta_cfg=cfg),
            ids, mask, pool)
        assert len(count_flash) == 3, (s, len(count_flash))
        assert all(sh == (1, 8, s, 96) for sh in count_flash)


def test_gestsync_windows_stay_dense_by_design(count_flash):
    params = G.init_params(jax.random.PRNGKey(1))
    frames = jnp.zeros((56, 270, 480, 3))  # T=32 bucket + 24 edge pad
    jax.eval_shape(lambda f: G.extract_features(params, f), frames)
    # the 21-token window transformer fails t % 8 == 0 -> dense everywhere
    assert count_flash == []


def test_2d_score_mask_stays_dense(count_flash):
    params = T.init_mha(jax.random.PRNGKey(2), 512)
    x = jnp.zeros((2, 128, 512))
    mask2d = jnp.ones((2, 128, 128))  # (Tq, Tk) mask: not key-validity
    jax.eval_shape(
        lambda p, x, m: T.multi_head_attention(p, x, x, x, m, 8),
        params, x, mask2d)
    assert count_flash == []


def test_flash_numerics_at_new_small_buckets():
    """The widened gate's shapes (one sub-128 block) match dense numerics
    in interpret mode."""
    key = jax.random.PRNGKey(3)
    for t, d_k in ((16, 64), (32, 64), (64, 64), (32, 96), (64, 96)):
        q, k, v = jax.random.normal(key, (3, 2, 4, t, d_k), jnp.float32)
        mask = (jax.random.uniform(key, (2, t)) > 0.3).astype(jnp.float32)
        mask = mask.at[:, 0].set(1.0)
        out = FA.flash_attention(q, k, v, mask, 128, 128, True)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(d_k))
        scores = jnp.where(mask[:, None, None, :] == 0, -1e9, scores)
        ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
