"""extract-feats CLI end-to-end on a synthetic video (slow: full-resolution
conv tower on the CPU backend)."""

import json
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow

media = pytest.importorskip("jegal_tpu.host.media")


def test_extract_feats_cli(tmp_path, rng, capsys):
    import pandas as pd

    from jegal_tpu.cli.main import main
    from jegal_tpu.convert import checkpoints as C
    from jegal_tpu.models import gestsync as G

    vid_dir = tmp_path / "vids" / "clips"
    vid_dir.mkdir(parents=True)
    frames = (rng.random((8, 270, 480, 3)) * 255).astype(np.uint8)
    media.encode_video(str(vid_dir / "c0.avi"), frames, fps=25.0)
    pd.DataFrame([{"filename": "clips/c0"}]).to_csv(tmp_path / "f.csv",
                                                    index=False)
    ckpt = str(tmp_path / "gestsync.npz")
    C.save_npz(G.init_params(jax.random.PRNGKey(0)), ckpt)

    res = str(tmp_path / "feats")
    main(["extract-feats", "--file_path", str(tmp_path / "f.csv"),
          "--video_dir", str(tmp_path / "vids"), "--res_dir", res,
          "--checkpoint_path", ckpt])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == {"done": 1, "skipped": 0, "failed": 0}
    feats = np.load(os.path.join(res, "clips/c0.npy"))
    assert feats.shape == (8, 1024)
    assert np.isfinite(feats).all()

    # resume: second run skips
    main(["extract-feats", "--file_path", str(tmp_path / "f.csv"),
          "--video_dir", str(tmp_path / "vids"), "--res_dir", res,
          "--checkpoint_path", ckpt])
    out2 = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out2)["skipped"] == 1


def test_extract_feats_cli_batched_equals_single(tmp_path, rng, capsys):
    """--batch_size 2 over 3 ragged clips: same .npy outputs as the
    per-video path (cross-video tower batching + prefetch thread)."""
    import pandas as pd

    from jegal_tpu.cli.main import main
    from jegal_tpu.convert import checkpoints as C
    from jegal_tpu.models import gestsync as G

    vid_dir = tmp_path / "vids"
    vid_dir.mkdir()
    lengths = (5, 8, 8)
    for i, t in enumerate(lengths):
        frames = (rng.random((t, 270, 480, 3)) * 255).astype(np.uint8)
        media.encode_video(str(vid_dir / f"c{i}.avi"), frames, fps=25.0)
    pd.DataFrame([{"filename": f"c{i}"} for i in range(3)]).to_csv(
        tmp_path / "f.csv", index=False)
    ckpt = str(tmp_path / "gestsync.npz")
    C.save_npz(G.init_params(jax.random.PRNGKey(0)), ckpt)

    common = ["--file_path", str(tmp_path / "f.csv"),
              "--video_dir", str(vid_dir), "--checkpoint_path", ckpt]
    main(["extract-feats", *common, "--res_dir", str(tmp_path / "single")])
    main(["extract-feats", *common, "--res_dir", str(tmp_path / "batched"),
          "--batch_size", "2"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == {"done": 3, "skipped": 0, "failed": 0}
    for i, t in enumerate(lengths):
        a = np.load(tmp_path / "single" / f"c{i}.npy")
        b = np.load(tmp_path / "batched" / f"c{i}.npy")
        assert a.shape == b.shape == (t, 1024)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_extract_many_from_raw_frames(rng):
    """extract_many accepts raw frames for 'v' samples and routes them
    through the batched tower; results equal the visual_feats path."""
    import jax.numpy as jnp

    from jegal_tpu.api import JegalEngine
    from jegal_tpu.models import gestsync as G
    from jegal_tpu.models import jegal as J

    engine = JegalEngine(
        jegal_params=J.init_params(jax.random.PRNGKey(2)),
        gestsync_params=G.init_params(jax.random.PRNGKey(3)))
    frames = (rng.random((2, 5, 270, 480, 3)) * 255).astype(np.uint8)
    outs = engine.extract_many(
        [{"frames": frames[0], "fname": "f0"},
         {"frames": frames[1], "fname": "f1"}],
        modalities="v", batch_size=2)
    assert outs[0]["gesture_emb"].shape == (5, 512)
    # equals the precomputed-features path
    feats = engine.gestsync_features_from_raw_many(
        [(frames[0], None), (frames[1], None)], batch_size=2)
    ref = engine.extract(modalities="v", visual_feats=feats[1], fname="f1")
    np.testing.assert_allclose(outs[1]["gesture_emb"], ref["gesture_emb"],
                               rtol=1e-5, atol=1e-5)


def test_long_video_pe_extension(rng):
    """T > 500 (the reference's PE cap, where it would crash) must work."""
    import jax.numpy as jnp

    from jegal_tpu.models import jegal as J

    params = J.init_params(jax.random.PRNGKey(1))
    t = 600
    feats = jnp.asarray(rng.standard_normal((1, t, 1024)).astype(np.float32))
    out = J.forward_gestures(params, feats, jnp.ones((1, t)))
    assert out.shape == (1, t, 512)
    assert np.isfinite(np.asarray(out)).all()
