"""Training checkpoint / resume (Orbax).

The reference has load-only torch .pth checkpoints and no save/resume at
all (SURVEY.md §5.4). Here: async-capable Orbax checkpointing of the full
TrainState (params, optimizer moments, step) with restore that reproduces
sharded placement on the current mesh.
"""

from __future__ import annotations

import os


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_train_state(ckpt_dir: str, state, step: int | None = None,
                     max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    step = int(state.step) if step is None else step
    mgr.save(step, args=ocp.args.StandardSave(
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step}))
    mgr.wait_until_finished()
    mgr.close()


def restore_train_state(ckpt_dir: str, template_state, step: int | None = None):
    """Restore into the structure (and shardings) of `template_state`."""
    import orbax.checkpoint as ocp

    from jegal_tpu.training.trainer import TrainState

    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    template = {"params": template_state.params,
                "opt_state": template_state.opt_state,
                "step": template_state.step}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return TrainState(restored["params"], restored["opt_state"],
                      restored["step"])
