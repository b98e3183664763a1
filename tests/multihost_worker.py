"""Subprocess worker for the 2-process multi-host test.

Run as: python multihost_worker.py <process_id> <coordinator_port> <nprocs>
with XLA_FLAGS=--xla_force_host_platform_device_count=<k> in the env.
Forces the CPU platform in-process (the axon TPU plugin ignores the
JAX_PLATFORMS env var), joins the jax.distributed coordination service,
and prints ONE json line with everything the parent asserts on:
process identity, global device count, host_shard split, CLI shard
resolution, and a cross-process all-reduce both via GSPMD (jit sum of a
'data'-sharded global array) and via an explicit shard_map psum.
"""

import json
import os
import sys

idx, port, n = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

from jegal_tpu.parallel.mesh import (host_shard, initialize_distributed,
                                     make_mesh)

rank, world = initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=n, process_id=idx)

import argparse

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from jegal_tpu.cli.main import _resolve_shard

ndev = len(jax.devices())
local = ndev // n
shard = host_shard(list(range(10)))
cli_rank, cli_nshard = _resolve_shard(
    argparse.Namespace(rank=None, nshard=None))

mesh = make_mesh(model_parallel=1)
sh = NamedSharding(mesh, P("data"))
glob = np.arange(ndev, dtype=np.float32)
x = jax.make_array_from_process_local_data(
    sh, glob[idx * local:(idx + 1) * local])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
ps = jax.shard_map(lambda v: jax.lax.psum(v, "data"), mesh=mesh,
                   in_specs=P("data"), out_specs=P())(x)
print(json.dumps({"rank": rank, "world": world, "ndev": ndev,
                  "shard": shard, "cli": [cli_rank, cli_nshard],
                  "sum": float(total), "psum": float(np.asarray(ps)[0])}))
