"""Dataset-scale L4 benchmark (VERDICT r3 item 3): a 500-row AVS-shaped
corpus through the batch embedding extractor and all three on-device evals,
wall-clocked end-to-end on the chip.

This is the workload the reference exists for — its entire evaluation loop
is extract_jegal_embs.py:56-125 over the 500-row avs_{ret,spot,asd}.csv
sets followed by evaluate_{retrieval,spotting,asd}.py. Here one synthetic
500-row corpus carries every column the three evals need (phrase +
word_boundaries + target_word_boundary + neg_files), so a single
extract-embs pass feeds the whole trio.

Usage: python benchmarks/corpus_bench.py [n_rows]  -> one JSON line.
bench.py embeds the result as corpus_500_* fields in the artifact.
"""

import json
import os
import shutil
import string
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_corpus(root: str, n_rows: int, t_frames: int = 125,
                 seed: int = 0) -> dict:
    """Write feature bank (.npy), wavs, and the AVS-shaped CSV."""
    import pandas as pd

    from jegal_tpu.host.media import write_wav

    rng = np.random.default_rng(seed)
    feature_dir = os.path.join(root, "feats")
    video_dir = os.path.join(root, "wavs")
    os.makedirs(os.path.join(feature_dir, "corpus"))
    os.makedirs(os.path.join(video_dir, "corpus"))
    letters = string.ascii_lowercase
    names = [f"corpus/c{i:04d}" for i in range(n_rows)]
    rows = []
    for i, name in enumerate(names):
        np.save(os.path.join(feature_dir, name + ".npy"),
                rng.standard_normal((t_frames, 1024)).astype(np.float32))
        wav = (rng.standard_normal(t_frames * 640) * 500).astype(np.float32)
        write_wav(os.path.join(video_dir, name + ".wav"), wav)
        n_words = int(rng.integers(3, 8))
        words = ["".join(rng.choice(list(letters), rng.integers(2, 7)))
                 for _ in range(n_words)]
        span = t_frames // n_words
        wbs = [[w, j * span, min(t_frames - 1, (j + 1) * span - 1)]
               for j, w in enumerate(words)]
        tgt = wbs[int(rng.integers(0, n_words))]
        negs = [names[int(k)] for k in
                rng.choice(n_rows, size=6, replace=False) if names[k] != name
                ][:5]
        rows.append({
            "filename": name,
            "phrase": " ".join(words),
            "word_boundaries": str(wbs),
            "target_word_boundary": str(tgt),
            "neg_files": str(negs),
        })
    csv_path = os.path.join(root, "corpus.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return {"csv": csv_path, "feature_dir": feature_dir,
            "video_dir": video_dir}


def main(n_rows: int = 500, batch_size: int = 16) -> dict:
    import jax
    import jax.numpy as jnp
    import pandas as pd

    import __graft_entry__ as E
    from jegal_tpu.api import JegalEngine
    from jegal_tpu.cli.main import _data_mesh, setup_compilation_cache
    from jegal_tpu.data.datasets import extract_embeddings_csv
    from jegal_tpu.eval import asd, retrieval, spotting

    setup_compilation_cache()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from tok_util import make_word_tokenizer

    root = tempfile.mkdtemp(prefix="jegal_corpus_bench_")
    try:
        print(f"synthesizing {n_rows}-row corpus...", file=sys.stderr)
        paths = synth_corpus(root, n_rows)
        jparams, rparams, cfg = E._models(jax.random.PRNGKey(0),
                                          roberta_layers=12, vocab=250002)
        engine = JegalEngine(jegal_params=jparams, roberta_params=rparams,
                             roberta_cfg=cfg,
                             tokenizer=make_word_tokenizer(),
                             dtype=jnp.bfloat16)
        res_dir = os.path.join(root, "embs")
        mesh = _data_mesh() if batch_size > 1 else None

        # COLD pass: includes every jit compile the corpus hits. The WARM
        # pass re-runs the same corpus on the same engine (fresh res_dir so
        # the idempotent skip doesn't shortcut it) — that is the rows/sec a
        # long-running extraction job actually sees (VERDICT r4 item 8).
        t0 = time.perf_counter()
        stats = extract_embeddings_csv(
            engine, csv_path=paths["csv"], video_dir=paths["video_dir"],
            feature_dir=paths["feature_dir"],
            res_dir=os.path.join(res_dir, "vta"), modalities="vta",
            batch_size=batch_size, mesh=mesh)
        t_extract = time.perf_counter() - t0
        assert stats["done"] == n_rows, stats

        t0 = time.perf_counter()
        stats2 = extract_embeddings_csv(
            engine, csv_path=paths["csv"], video_dir=paths["video_dir"],
            feature_dir=paths["feature_dir"],
            res_dir=os.path.join(res_dir, "vta_warm"), modalities="vta",
            batch_size=batch_size, mesh=mesh)
        t_warm = time.perf_counter() - t0
        assert stats2["done"] == n_rows, stats2
        shutil.rmtree(os.path.join(res_dir, "vta_warm"))

        pkl_dir = os.path.join(res_dir, "vta")
        t0 = time.perf_counter()
        ret = retrieval.evaluate_device(pkl_dir, mesh)
        t_ret = time.perf_counter() - t0
        t0 = time.perf_counter()
        spot = spotting.evaluate_device(pkl_dir, mesh=mesh)
        t_spot = time.perf_counter() - t0
        t0 = time.perf_counter()
        asd_res = asd.evaluate_device(pkl_dir, pd.read_csv(paths["csv"]),
                                      mesh)
        t_asd = time.perf_counter() - t0

        wall = t_extract + t_ret + t_spot + t_asd
        out = {
            "metric": f"corpus-{n_rows} L4 wall clock (extract-embs "
                      f"batch={batch_size} bf16 + on-device "
                      "ret/spot/asd evals)",
            "value": round(wall, 2), "unit": "s",
            "rows": n_rows,
            "extract_s": round(t_extract, 2),
            "extract_rows_per_sec": round(n_rows / t_extract, 2),
            # compile_s: cold-minus-warm — the one-time jit cost of the
            # (combo, bucket, ladder) graphs this corpus hits
            "extract_compile_s": round(max(0.0, t_extract - t_warm), 2),
            "extract_warm_s": round(t_warm, 2),
            "extract_warm_rows_per_sec": round(n_rows / t_warm, 2),
            "eval_retrieval_s": round(t_ret, 2),
            "eval_spotting_s": round(t_spot, 2),
            "eval_asd_s": round(t_asd, 2),
            "retrieval_R1_c2g": ret.get("c2g", {}).get("R1"),
            "spotting_n": spot.get("total"),
            "asd_n": asd_res.get("total", asd_res.get("n")),
        }
        print(json.dumps(out))
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
