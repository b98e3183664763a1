"""Device mesh + sharding rules.

The reference has no distributed backend at all (its 'parallelism' is
launch-N-processes over file shards, SURVEY.md §2.4). The TPU-native design:
a 2-D ('data', 'model') jax.sharding.Mesh; batch dims shard over 'data',
attention-head / FFN-hidden dims over 'model'; XLA GSPMD inserts the
collectives (all-reduce on the model axis, gradient psum on the data axis)
over ICI.

The JEGAL model is small (~100M params), so 'model' parallelism is optional
(mesh model=1 replicates); it exists so the same code scales to pods and so
multi-chip correctness is continuously tested on the virtual CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kw):
    """Multi-host TPU initialization (jax.distributed). The reference's
    multi-process story is manual --rank/--nshard file sharding
    (SURVEY.md §2.4); on TPU pods each host calls this once, then
    make_mesh() spans all global devices and per-host file shards come from
    jax.process_index()/jax.process_count()."""
    jax.distributed.initialize(**kw)
    return jax.process_index(), jax.process_count()


def host_shard(items, rank: int | None = None, nshard: int | None = None):
    """Slice a work list for this host (jax.process_index by default —
    the TPU-native replacement for the reference's --rank/--nshard)."""
    rank = jax.process_index() if rank is None else rank
    nshard = jax.process_count() if nshard is None else nshard
    return list(items)[rank::nshard]


def make_mesh(num_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    devices = np.asarray(devices[:n])
    assert n % model_parallel == 0, (n, model_parallel)
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def put_batch(arrays, mesh: Mesh | None = None):
    """Place host (numpy) batch arrays on device, leading axis sharded over
    the mesh 'data' axis when a mesh is given.

    device_put on the NUMPY array moves each 'data' shard host->device
    exactly once; jnp.asarray first would land the whole batch on device 0
    and then reshard device-to-device — double movement of the pipeline's
    largest tensors. The single helper for every batched host->device
    boundary (engine tower/forward batches, on-device evals)."""
    import jax.numpy as jnp

    if mesh is None:
        return [jnp.asarray(a) for a in arrays]
    spec = NamedSharding(mesh, P("data"))
    return [jax.device_put(np.asarray(a), spec) for a in arrays]


# ---------------------------------------------------------------------------
# Parameter sharding rules (tensor parallelism)
# ---------------------------------------------------------------------------

def _mha_spec():
    # q/k/v: shard the head (output) dim; o: shard the input (head) dim —
    # the standard Megatron layout: one all-reduce per attention block.
    return {
        "q": {"kernel": P(None, "model"), "bias": P("model")},
        "k": {"kernel": P(None, "model"), "bias": P("model")},
        "v": {"kernel": P(None, "model"), "bias": P("model")},
        "o": {"kernel": P("model", None), "bias": P()},
    }


def _ffn_spec():
    return {
        "w1": {"kernel": P(None, "model"), "bias": P("model")},
        "w2": {"kernel": P("model", None), "bias": P()},
    }


def _encoder_spec(num_layers: int, final_norm: bool):
    layer = {
        "attn": _mha_spec(),
        "ff": _ffn_spec(),
        "norm1": {"scale": P(), "bias": P()},
        "norm2": {"scale": P(), "bias": P()},
    }
    spec = {"layers": [layer] * num_layers}
    if final_norm:
        spec["norm"] = {"scale": P(), "bias": P()}
    return spec


def jegal_param_spec():
    """PartitionSpec pytree matching jegal_tpu.models.jegal.init_params."""
    lin = {"kernel": P(), "bias": P()}
    ln = {"scale": P(), "bias": P()}
    conv = {"kernel": P(), "bias": P()}
    bn = {"scale": P(), "bias": P(), "mean": P(), "var": P()}
    from jegal_tpu.models.jegal import AUDIO_CNN_SPEC

    cnn = []
    for spec in AUDIO_CNN_SPEC:
        blk = {"conv": conv}
        if spec["bn"]:
            blk["bn"] = bn
        cnn.append(blk)
    return {
        "proj_ip_rgb": [lin, lin],
        "proj_ip_ln": ln,
        "encoder_rgb": _encoder_spec(6, True),
        "proj_op_rgb": lin,
        "encoder_text": _encoder_spec(3, True),
        "proj_op_text": lin,
        "cnn": cnn,
        "proj_op_audio": lin,
        "proj_op_fusion_content": [lin, lin],
        "proj_op_align_gesture": [lin, lin],
        "proj_op_align_content": [lin, lin],
    }


def roberta_param_spec(num_layers: int):
    layer = {
        "q": {"kernel": P(None, "model"), "bias": P("model")},
        "k": {"kernel": P(None, "model"), "bias": P("model")},
        "v": {"kernel": P(None, "model"), "bias": P("model")},
        "attn_out": {"kernel": P("model", None), "bias": P()},
        "attn_ln": {"scale": P(), "bias": P()},
        "inter": {"kernel": P(None, "model"), "bias": P("model")},
        "out": {"kernel": P("model", None), "bias": P()},
        "out_ln": {"scale": P(), "bias": P()},
    }
    return {
        "embeddings": {
            "word": P(),
            "position": P(),
            "token_type": P(),
            "ln": {"scale": P(), "bias": P()},
        },
        "layers": [layer] * num_layers,
    }


def shard_pytree(tree, spec_tree, mesh: Mesh):
    """Place a parameter pytree on the mesh according to a spec pytree.

    The spec tree is traversed first (is_leaf stops at PartitionSpec, which
    is itself a tuple and would otherwise be flattened)."""
    def place(spec, x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, spec_tree, tree,
                        is_leaf=lambda x: isinstance(x, P))


def sharding_pytree(spec_tree, mesh: Mesh):
    """Spec pytree -> NamedSharding pytree (for jit in_shardings)."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                        is_leaf=lambda x: isinstance(x, P))
