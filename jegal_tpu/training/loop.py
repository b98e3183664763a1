"""Training loop driver: CSV corpus -> batches -> sharded steps -> Orbax.

The reference never released training (README.md:163-165) and its in-repo
training path is broken dead code (SURVEY.md §2.9.1-2); this is the working
TPU-native counterpart: random word-window batches (training/data.py),
contrastive step (training/trainer.py), data-parallel over all local
devices, JSONL metrics, periodic checkpoints with resume.
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np

import jax


def train(
    csv_path: str,
    feature_dir: str,
    jegal_params,
    roberta_params,
    roberta_cfg,
    tokenizer,
    steps: int = 1000,
    batch_size: int = 8,
    lr: float = 1e-4,
    warmup_steps: int = 0,
    cosine_decay: bool = False,
    accum_steps: int = 1,
    remat: bool = False,
    ckpt_dir: str | None = None,
    ckpt_every: int = 500,
    log_path: str | None = None,
    seed: int = 0,
    model_parallel: int = 1,
) -> dict:
    import pandas as pd

    from jegal_tpu.parallel.mesh import make_mesh
    from jegal_tpu.training import trainer
    from jegal_tpu.training.data import collate_training_batch, load_training_sample
    from jegal_tpu.utils.logging import MetricWriter, get_logger

    log = get_logger("train")
    metrics = MetricWriter(log_path)
    df = pd.read_csv(csv_path)
    rng = np.random.default_rng(seed)

    optimizer = trainer.make_optimizer(
        lr=lr, warmup_steps=warmup_steps,
        total_steps=steps if cosine_decay else None,
        accum_steps=accum_steps)
    state = trainer.init_state(jegal_params, optimizer)
    start_step = 0
    if ckpt_dir and os.path.isdir(ckpt_dir):
        try:
            from jegal_tpu.parallel.checkpoint import restore_train_state

            state = restore_train_state(ckpt_dir, state)
            start_step = int(state.step)
            log.info("resumed from step %d", start_step)
        except FileNotFoundError:
            pass

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, model_parallel=model_parallel) if n_dev > 1 else None
    step_fn = trainer.make_train_step(optimizer, roberta_cfg, remat=remat)
    key = jax.random.PRNGKey(seed)

    def make_batch(max_attempts: int = 50):
        """Always returns exactly batch_size rows: invalid samples are
        dropped by the collator, so short batches are topped up by cyclic
        repetition (a fixed batch keeps one jit and keeps the row count
        divisible by the mesh 'data' axis). Raises after max_attempts of
        zero valid samples (bad --feature_dir / CSV paths)."""
        for _ in range(max_attempts):
            rows = [df.iloc[int(i)] for i in
                    rng.integers(0, len(df), batch_size)]
            samples = [load_training_sample(r, feature_dir, rng) for r in rows]
            batch = collate_training_batch(samples, tokenizer)
            if batch is None:
                continue
            n = batch["visual_feats"].shape[0]
            if n < batch_size:
                import jax.numpy as jnp

                idx = jnp.arange(batch_size) % n
                batch = {k: v[idx] for k, v in batch.items()}
            return batch
        raise RuntimeError(
            f"no valid training batch after {max_attempts} draws — check "
            "--feature_dir and the CSV's text_path/audio_path columns")

    last_loss = float("nan")
    t0 = time.perf_counter()
    sharded = False
    batch = make_batch()
    for step in range(start_step, steps):
        rparams = roberta_params
        if mesh is not None:
            if not sharded:
                state, roberta_params, _ = trainer.shard_training(
                    mesh, state, roberta_params, batch)
                rparams = roberta_params
                sharded = True
            from jax.sharding import NamedSharding, PartitionSpec

            data = NamedSharding(mesh, PartitionSpec("data"))
            batch = {k: jax.device_put(v, data) for k, v in batch.items()}
        ctx = mesh if mesh is not None else contextlib.nullcontext()
        with ctx:
            state, loss = step_fn(state, batch, jax.random.fold_in(key, step),
                                  rparams)
        # build the NEXT batch before blocking on the loss fetch so host
        # data work overlaps device compute (one-step prefetch)
        if step + 1 < steps:
            batch = make_batch()
        last_loss = float(loss)
        metrics.write("train_step", step=step + 1, loss=round(last_loss, 5),
                      sec=round(time.perf_counter() - t0, 2))
        if ckpt_dir and (step + 1) % ckpt_every == 0:
            from jegal_tpu.parallel.checkpoint import save_train_state

            save_train_state(ckpt_dir, state)
            log.info("checkpoint at step %d", step + 1)

    if ckpt_dir:
        from jegal_tpu.parallel.checkpoint import save_train_state

        save_train_state(ckpt_dir, state)
    metrics.close()
    return {"steps": steps - start_step, "final_loss": last_loss}

