"""On-chip A/B: band vs window stem kernel at production planar geometry.

Methodology (fixes the confounded r4 attempt): N kernel reps inside ONE
jit via lax.fori_loop (input XOR-perturbed per rep to kill CSE), fetch a
single f32 scalar — no 56 MB m-grid fetch over the tunnel per rep.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

from jegal_tpu.models import gestsync as G
from jegal_tpu.ops.pallas import stem as S

N = 20
p = G.init_params(jax.random.PRNGKey(0))
blk = p["net_vid"][0]
lhs, scale, bias = S.stem_kernel_params(blk)

rng = np.random.default_rng(0)
xp = jnp.asarray(rng.integers(0, 255, (164, 90, 27, 160)).astype(np.uint8))


def make(impl, **kw):
    def body(i, carry):
        xi = xp ^ i.astype(jnp.uint8)
        out = S.stem_mgrid_planar(xi, lhs, scale, bias,
                                  dtype=jnp.bfloat16, impl=impl, **kw)
        return carry + out[0, 0, 0, 0].astype(jnp.float32)
    return jax.jit(lambda: jax.lax.fori_loop(0, N, body, 0.0))


VARIANTS = [("window", {}), ("band", {}),
            ("window+u8direct", {"u8_direct": True}),
            ("window+pairdot", {"pair_dot": True}),
            ("window+u8direct+pairdot", {"u8_direct": True,
                                         "pair_dot": True})]

import sys
only = sys.argv[1:] if len(sys.argv) > 1 else None
for name, kw in VARIANTS:
    if only and name not in only:
        continue
    impl = "band" if name == "band" else "window"
    fn = make(impl, **kw)
    t0 = time.time()
    v = float(np.asarray(fn()))
    t_compile = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        v = float(np.asarray(fn()))
        times.append(time.time() - t0)
    per = min(times) / N * 1e3
    print(f"{name}: {per:.3f} ms/chunk (best of 3x{N}; compile+first "
          f"{t_compile:.1f}s; probe={v:.3f})", flush=True)
