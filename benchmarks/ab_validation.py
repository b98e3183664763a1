"""On-chip A/B for VERDICT r3 item 8: forward_validation fused Pallas
sublayer kernels vs the pure-XLA path at the validation-loop shape
(b=8, T=125, full-width 12L/250k XLM-R, bf16). One ledger line results.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as E
from jegal_tpu.models import jegal as J

N = 10
jparams, rparams, cfg = E._models(jax.random.PRNGKey(3),
                                  roberta_layers=12, vocab=250002,
                                  max_pos=160)
rng = np.random.default_rng(0)
batch = E._example_batch(rng, b=8, t=125, s=32, w=16, mel=500, vocab=250002)

cast = lambda p: jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)
jparams, rparams = cast(jparams), cast(rparams)
batch = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
         for k, v in batch.items()}


def make(fused):
    def f():
        def body(i, carry):
            g, c = J.forward_validation(
                jparams, rparams,
                visual_feats=batch["visual_feats"] + carry,
                visual_mask=batch["visual_mask"],
                input_ids=batch["input_ids"],
                text_mask=batch["text_mask"],
                text_pool=batch["text_pool"],
                audio_mel=batch["audio_mel"],
                audio_pool=batch["audio_pool"],
                roberta_cfg=cfg, fused=fused)
            return carry + g[0, 0, 0].astype(jnp.bfloat16) * 0 \
                + c[0, 0, 0].astype(jnp.bfloat16) * 0 + 1
        return jax.lax.fori_loop(0, N, body, jnp.bfloat16(0.0))
    return jax.jit(f)


for fused in (True, False):
    fn = make(fused)
    t0 = time.time()
    v = float(np.asarray(fn()))
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        v = float(np.asarray(fn()))
        times.append(time.time() - t0)
    per = min(times) / N * 1e3
    print(f"fused={fused}: {per:.2f} ms/step (b=8 T=125; best of 3x{N}; "
          f"compile+first {tc:.1f}s; probe={v})", flush=True)
