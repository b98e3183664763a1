"""Utils coverage: profiling timers, metric writer, chin lines."""

import json

import numpy as np


def test_stage_timers():
    from jegal_tpu.utils.profiling import StageTimers

    t = StageTimers()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = json.loads(t.report())
    assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
    assert rep["a"]["total_s"] >= 0


def test_metric_writer(tmp_path):
    from jegal_tpu.utils.logging import MetricWriter

    p = str(tmp_path / "m.jsonl")
    w = MetricWriter(p)
    w.write("step", loss=1.5, step=1)
    w.write("step", loss=1.2, step=2)
    w.close()
    lines = [json.loads(line) for line in open(p)]
    assert len(lines) == 2
    assert lines[1]["loss"] == 1.2 and lines[1]["event"] == "step"
    assert "ts" in lines[0]


def test_chin_lines():
    from jegal_tpu.ops.video import FALLBACK_ROWS, chin_lines

    face = [{"x": 0.5, "y": 0.2}] * 468
    face[10] = {"x": 0.5, "y": 0.4}  # oval idx with max y
    kps = [{"face": face}, {"face": None}]
    rows = chin_lines(kps, resolution=(540, 960))  # 540 -> 270: scale 0.5
    # chin = y*H = 216; +16 -> 232; *0.5 -> 116
    assert rows[0] == 116
    assert rows[1] == FALLBACK_ROWS


def test_device_sync_noop_types():
    import jax.numpy as jnp

    from jegal_tpu.utils.profiling import device_sync

    device_sync({"a": jnp.ones((2, 2)), "b": None, "c": [jnp.zeros(3)]})


def test_host_shard():
    from jegal_tpu.parallel.mesh import host_shard

    items = list(range(10))
    shards = [host_shard(items, rank=r, nshard=3) for r in range(3)]
    assert sorted(sum(shards, [])) == items
    assert shards[0] == [0, 3, 6, 9]
