"""Checkpoint / resume via Orbax.

Capability superset of the reference (SURVEY.md §5): the reference only SAVES in
training (torch.save every i_save steps, /root/reference/train_dmsr.py:80-88) and only
LOADS in testing (hardcoded-iteration .tar, test_dmsr.py:93-109) — training can never
resume. Here both directions work for both drivers: {step, params_coarse, params_fine,
opt_state} round-trips, and ``latest_step`` discovers the newest checkpoint.
Multi-host-safe: orbax writes from a single controller process.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np


def _ckpt_dir(log_dir: str, step: int) -> str:
    return os.path.join(log_dir, "checkpoints", f"{step:06d}")


def save_checkpoint(log_dir: str, state) -> str:
    """state: render.trainstep.TrainState (any pytree of arrays + int step)."""
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = os.path.abspath(_ckpt_dir(log_dir, step))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": np.asarray(step),
        "params_coarse": jax.tree.map(np.asarray, state.params_coarse),
        "params_fine": jax.tree.map(np.asarray, state.params_fine),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(log_dir: str) -> Optional[int]:
    d = os.path.join(log_dir, "checkpoints")
    if not os.path.isdir(d):
        return None
    steps = [int(m.group(1)) for f in os.listdir(d) if (m := re.fullmatch(r"(\d+)", f))]
    return max(steps) if steps else None


def restore_checkpoint(log_dir: str, template_state, step: Optional[int] = None):
    """Returns a TrainState with the checkpoint contents, or None if absent.
    template_state provides the pytree structure/dtypes (from create_train_state)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(log_dir)
        if step is None:
            return None
    path = os.path.abspath(_ckpt_dir(log_dir, step))
    if not os.path.isdir(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    template = {
        "step": np.asarray(0),
        "params_coarse": jax.tree.map(np.asarray, template_state.params_coarse),
        "params_fine": jax.tree.map(np.asarray, template_state.params_fine),
        "opt_state": jax.tree.map(np.asarray, template_state.opt_state),
    }
    try:
        payload = ckptr.restore(path, template)
    except Exception as e:  # orbax's structure-diff formatter itself can throw opaquely
        raise ValueError(
            f"Checkpoint at {path} is incompatible with the current model/optimizer "
            f"structure (e.g. it was written with different netdepth/netwidth/ins_num). "
            f"Delete the stale checkpoints or point basedir/expname at a fresh run dir. "
            f"Original error: {type(e).__name__}: {e}"
        ) from e
    import jax.numpy as jnp

    from dmnerf_tpu.render.trainstep import TrainState

    return TrainState(
        step=jnp.asarray(payload["step"], jnp.int32),
        params_coarse=jax.tree.map(jnp.asarray, payload["params_coarse"]),
        params_fine=jax.tree.map(jnp.asarray, payload["params_fine"]),
        opt_state=jax.tree.map(jnp.asarray, payload["opt_state"]),
    )
