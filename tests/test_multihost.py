"""Multi-host execution test (VERDICT r2 item 4 / SURVEY §2.4, §5.8).

Two REAL processes join a local jax.distributed coordinator (CPU backend,
4 virtual devices each -> 8 global devices) and run the repo's own pod
blueprint: initialize_distributed(), host_shard(), the CLI's
process-index shard defaulting, and a cross-process all-reduce through
both GSPMD (jit over a 'data'-sharded global array) and an explicit
shard_map psum. This is the same code path a v5e pod runs per host
(docs/DEPLOYMENT.md), minus the ICI.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    port, n = _free_port(), 2
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), str(port), str(n)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(n)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_rank = {o["rank"]: o for o in outs}
    assert set(by_rank) == {0, 1}
    for r, o in by_rank.items():
        assert o["world"] == 2
        assert o["ndev"] == 8                  # global view spans both hosts
        assert o["shard"] == list(range(10))[r::2]
        assert o["cli"] == [r, 2]              # --rank/--nshard defaulting
        assert o["sum"] == 28.0                # sum(range(8)) across hosts
        assert o["psum"] == 28.0
