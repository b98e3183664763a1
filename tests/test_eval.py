"""Evaluation subsystem tests on synthetic embedding sets with known
ground-truth outcomes."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from jegal_tpu.eval import asd, heatmap, retrieval, spotting
from jegal_tpu.eval.common import attention_matrix


def _write_pkl(path, gesture, content, info):
    with open(path, "wb") as f:
        pickle.dump({"gesture_emb": gesture, "content_emb": content, "info": info}, f)


@pytest.fixture
def emb_dir(tmp_path, rng):
    """10 videos whose video-level gesture/content embeddings are
    near-identical pairs -> perfect retrieval."""
    d = tmp_path / "embs"
    d.mkdir()
    base = rng.standard_normal((10, 512)).astype(np.float32) * 5
    for i in range(10):
        t, w = 6 + i, 3
        gesture = np.tile(base[i], (t, 1)) + 0.01 * rng.standard_normal((t, 512)).astype(np.float32)
        content = np.tile(base[i], (w, 1)) + 0.01 * rng.standard_normal((w, 512)).astype(np.float32)
        _write_pkl(d / f"vid{i:02d}.pkl", gesture, content,
                   {"fname": f"vid{i:02d}", "phrase": f"p{i}"})
    return str(d)


def test_retrieval_perfect(emb_dir):
    res = retrieval.evaluate(emb_dir)
    for mode in ("c2g", "g2c"):
        assert res[mode]["R1"] == 1.0
        assert res[mode]["R5"] == 1.0
        assert res[mode]["MR"] == 1.0


def test_retrieval_known_ranks():
    """Hand-built similarity: diagonal is 2nd best in every row -> R1=0,
    R5=1, MR=2."""
    n = 6
    sim = np.zeros((n, n), np.float32)
    for i in range(n):
        sim[i, i] = 0.8
        sim[i, (i + 1) % n] = 0.9
    m = retrieval.compute_metrics(sim)
    assert m["R1"] == 0.0
    assert m["R5"] == 1.0
    assert m["MR"] == 2.0


def test_retrieval_device_matches_numpy(rng):
    """On-device similarity/rank path == numpy path at the 500-row AVS-Ret
    scale (single device, no mesh)."""
    q = rng.standard_normal((500, 512)).astype(np.float32)
    k = 0.7 * q + 0.3 * rng.standard_normal((500, 512)).astype(np.float32)
    host = retrieval.compute_metrics(retrieval.similarity_matrix(q, k))
    dev = retrieval.compute_metrics_device(q, k)
    assert host == pytest.approx(dev)


def test_retrieval_device_mesh_sharded(rng):
    """Rows sharded over the 8-device 'data' axis (with the 500->504 pad
    masked out) reproduce the host metrics exactly."""
    import jax

    from jegal_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(len(jax.devices()), model_parallel=1)
    q = rng.standard_normal((500, 512)).astype(np.float32)
    k = 0.7 * q + 0.3 * rng.standard_normal((500, 512)).astype(np.float32)
    host = retrieval.compute_metrics(retrieval.similarity_matrix(q, k))
    dev = retrieval.compute_metrics_device(q, k, mesh=mesh)
    assert host == pytest.approx(dev)


def test_retrieval_evaluate_device(emb_dir):
    res = retrieval.evaluate_device(emb_dir)
    host = retrieval.evaluate(emb_dir)
    for mode in ("c2g", "g2c"):
        assert res[mode] == pytest.approx(host[mode])


def test_spotting_hit_and_miss(rng):
    t, d = 40, 16
    rng2 = np.random.default_rng(1)
    content = rng2.standard_normal((3, d)).astype(np.float32)
    gesture = 0.01 * rng2.standard_normal((t, d)).astype(np.float32)
    # make frame 20 strongly aligned to word 1
    gesture[20] = content[1] * 10
    gesture[5] = content[2] * 10  # word c peaks far outside its span
    wbs = [["a", 0, 5], ["b", 18, 22], ["c", 30, 35]]
    ok, pred, score = spotting.spot_word(gesture, content, wbs, ["b", 18, 22])
    assert ok and pred == 20 and score >= 0.5
    # word c's peak frame (5) is outside [30-9, 35+9] -> miss
    ok_c, pred_c, _ = spotting.spot_word(gesture, content, wbs, ["c", 30, 35])
    assert pred_c == 5 and not ok_c


def test_spotting_frame_threshold():
    t, d = 30, 8
    content = np.eye(2, d).astype(np.float32)
    gesture = np.full((t, d), 0.001, np.float32)
    gesture[14] = content[0] * 10  # peak at frame 14
    wbs = [["x", 20, 25], ["y", 0, 3]]
    # span 20..25 with thresh 9 -> [11, 34]: frame 14 is a hit
    ok, pred, _ = spotting.spot_word(gesture, content, wbs, ["x", 20, 25])
    assert ok and pred == 14
    ok2, _, _ = spotting.spot_word(gesture, content, wbs, ["x", 20, 25], frame_thresh=2)
    assert not ok2


def test_asd(tmp_path, rng):
    d = tmp_path / "asd"
    d.mkdir()
    # positive speaker: gesture == content direction; negatives: orthogonal-ish
    base = rng.standard_normal((4, 512)).astype(np.float32)
    names = ["spk0/a", "spk1/b", "spk2/c", "spk3/d"]
    for i, n in enumerate(names):
        g = np.tile(base[i], (5, 1))
        c = np.tile(base[i], (3, 1))
        _write_pkl(d / (n.split("/")[0] + "__" + n.split("/")[1] + ".pkl"), g, c, {})
    df = pd.DataFrame([
        {"filename": "spk0/a", "neg_files": str(["spk1/b", "spk2/c", "spk3/d"])}
    ])
    res = asd.evaluate(str(d), df)
    assert res["evaluated"] == 1
    assert res["acc_2spk"] == 1.0 and res["acc_4spk"] == 1.0


def test_asd_counts_follow_config(tmp_path, rng, monkeypatch):
    """counts must be built from config.asd_speakers, not a hard-coded
    {2,4,6} (regression: a changed config raised KeyError)."""
    import dataclasses

    d = tmp_path / "asd"
    d.mkdir()
    base = rng.standard_normal((3, 512)).astype(np.float32)
    for i, n in enumerate(["s0/a", "s1/b", "s2/c"]):
        g = np.tile(base[i], (5, 1))
        _write_pkl(d / (n.replace("/", "__") + ".pkl"), g,
                   np.tile(base[i], (3, 1)), {})
    df = pd.DataFrame([
        {"filename": "s0/a", "neg_files": str(["s1/b", "s2/c"])}])
    cfg = dataclasses.replace(asd._CFG,
                              eval=dataclasses.replace(asd._CFG.eval,
                                                       asd_speakers=(2, 3)))
    monkeypatch.setattr(asd, "_CFG", cfg)
    res = asd.evaluate(str(d), df)
    assert res["acc_2spk"] == 1.0 and res["acc_3spk"] == 1.0
    assert "acc_4spk" not in res


@pytest.fixture
def spot_dir(tmp_path, rng):
    """500 synthetic spotting videos with ragged (T, W) and random target
    words; ~half engineered to be hits."""
    d = tmp_path / "spot"
    d.mkdir()
    for i in range(500):
        t = int(rng.integers(20, 48))
        w = int(rng.integers(2, 9))
        dim = 64
        content = rng.standard_normal((w, dim)).astype(np.float32)
        gesture = 0.05 * rng.standard_normal((t, dim)).astype(np.float32)
        wi = int(rng.integers(0, w))
        span = sorted(rng.integers(0, t, size=2).tolist())
        if i % 2 == 0:  # plant the peak inside the span -> likely hit
            gesture[min(span[0], t - 1)] = content[wi] * 8
        wbs = [[f"w{j}", j, j + 1] for j in range(w)]
        wbs[wi] = [f"w{wi}", span[0], span[1]]
        _write_pkl(d / f"v{i:03d}.pkl", gesture, content,
                   {"word_boundaries": str(wbs),
                    "target_word_boundary": str(wbs[wi])})
    return str(d)


def test_spotting_device_matches_numpy(spot_dir):
    """On-device batched spotting == the per-video numpy path at the
    500-video AVS-Spot scale (ragged T/W padded + masked)."""
    host = spotting.evaluate(spot_dir)
    dev = spotting.evaluate_device(spot_dir)
    assert dev == host
    assert 0 < host["correct"] < host["total"]  # both branches exercised


def test_spotting_device_mesh_sharded(spot_dir):
    """Videos sharded over the 8-device 'data' axis (500 -> 504 pad rows
    carry 1 dummy frame/word) reproduce the host result exactly."""
    import jax

    from jegal_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(len(jax.devices()), model_parallel=1)
    host = spotting.evaluate(spot_dir)
    dev = spotting.evaluate_device(spot_dir, mesh=mesh)
    assert dev == host


@pytest.fixture
def spot_outlier_dir(tmp_path, rng):
    """Mixed-length spotting set with long outliers: 37 short videos
    (T in [20, 48)) plus 3 long ones (T ~ 600/900/1500) so the grouped
    device path must split them instead of padding everything to T=1500."""
    d = tmp_path / "spot_mixed"
    d.mkdir()
    dim = 64
    lengths = [int(rng.integers(20, 48)) for _ in range(37)] + [600, 900, 1500]
    for i, t in enumerate(lengths):
        w = int(rng.integers(2, 9))
        content = rng.standard_normal((w, dim)).astype(np.float32)
        gesture = 0.05 * rng.standard_normal((t, dim)).astype(np.float32)
        wi = int(rng.integers(0, w))
        span = sorted(rng.integers(0, t, size=2).tolist())
        if i % 2 == 0:
            gesture[min(span[0], t - 1)] = content[wi] * 8
        wbs = [[f"w{j}", j, j + 1] for j in range(w)]
        wbs[wi] = [f"w{wi}", span[0], span[1]]
        _write_pkl(d / f"v{i:03d}.pkl", gesture, content,
                   {"word_boundaries": str(wbs),
                    "target_word_boundary": str(wbs[wi])})
    return str(d)


def test_spotting_device_multi_group(spot_outlier_dir, monkeypatch):
    """Shrinking MAX_GROUP_ELEMS forces the device eval to run several
    length-bucketed groups (the long-outlier protection); the index
    scatter back through the sorted order must still reproduce the host
    result exactly, on one device and sharded over the mesh (where group
    sizes don't divide the 'data' axis and need per-group pad rows)."""
    import jax

    from jegal_tpu.parallel.mesh import make_mesh

    # 40 videos, d=64: budget of 2^13 elems caps a T=128-bucket group at
    # exactly 1 video, a T=32 group at 4 — guarantees >= 5 groups
    monkeypatch.setattr(spotting, "MAX_GROUP_ELEMS", 1 << 13)
    host = spotting.evaluate(spot_outlier_dir)
    dev = spotting.evaluate_device(spot_outlier_dir)
    assert dev == host
    assert 0 < host["correct"] < host["total"]

    mesh = make_mesh(len(jax.devices()), model_parallel=1)
    dev_m = spotting.evaluate_device(spot_outlier_dir, mesh=mesh)
    assert dev_m == host


@pytest.fixture
def asd_set(tmp_path, rng):
    """500 ASD queries over a 40-speaker pool with ragged negative lists
    (some missing files, some shorter than the largest n_spk)."""
    d = tmp_path / "asd500"
    d.mkdir()
    base = rng.standard_normal((40, 512)).astype(np.float32)
    names = [f"s{i}/clip" for i in range(40)]
    for i, n in enumerate(names):
        noise = 0.8 * rng.standard_normal((512,)).astype(np.float32)
        _write_pkl(d / (n.replace("/", "__") + ".pkl"),
                   np.tile(base[i] + noise, (5, 1)),
                   np.tile(base[i], (3, 1)), {})
    rows = []
    for i in range(500):
        qi = int(rng.integers(0, 40))
        negs = [names[j] for j in rng.permutation(40)[:int(rng.integers(1, 8))]
                if j != qi]
        if i % 7 == 0:  # a missing negative file must be skipped, not fatal
            negs.append("missing/x")
        rows.append({"filename": names[qi], "neg_files": str(negs)})
    return str(d), pd.DataFrame(rows)


def test_asd_device_matches_numpy(asd_set):
    """On-device batched ASD == the per-query numpy path at the 500-query
    scale (ragged candidate counts masked)."""
    res_dir, df = asd_set
    host = asd.evaluate(res_dir, df)
    dev = asd.evaluate_device(res_dir, df)
    assert dev["evaluated"] == host["evaluated"] == 500
    for k in host:
        assert dev[k] == pytest.approx(host[k]), k


def test_asd_device_mesh_sharded(asd_set):
    import jax

    from jegal_tpu.parallel.mesh import make_mesh

    res_dir, df = asd_set
    mesh = make_mesh(len(jax.devices()), model_parallel=1)
    host = asd.evaluate(res_dir, df)
    dev = asd.evaluate_device(res_dir, df, mesh=mesh)
    for k in host:
        assert dev[k] == pytest.approx(host[k]), k


def test_attention_matrix_shape_and_softmax(rng):
    g = rng.standard_normal((12, 32)).astype(np.float32)
    c = rng.standard_normal((4, 32)).astype(np.float32)
    attn = attention_matrix(g, c)
    assert attn.shape == (4, 12)
    # softmax normalizes over words (axis 0 after transpose)
    np.testing.assert_allclose(attn.sum(axis=0), np.ones(12), rtol=1e-5)


def test_heatmap_render(tmp_path, emb_dir, rng):
    src = os.path.join(emb_dir, "vid00.pkl")
    with open(src, "rb") as f:
        feats = pickle.load(f)
    feats["info"]["word_boundaries"] = str([["hello", 0, 3], ["world", 4, 5], ["x", 6, 6]])
    with open(src, "wb") as f:
        pickle.dump(feats, f)
    out = heatmap.plot_from_pkl(src, fname=str(tmp_path / "hm"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000
