"""Checkpoint save/load/resume via Orbax — the unified replacement for the reference's
per-project idioms (rank-0 torch.save every eval_iters `SCD dist_train_voc.py:417-420`;
WaveCAM per-stage weight chaining; DRFL save/load_networks + continue_train
`model_dcl.py:270-324`; RSSFormer's ever checkpoint module)."""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def _named_batch_stats(state) -> dict:
    """The batch_stats collection as a NAMED tree, regardless of storage.

    Deferred-EMA states (`train/state.py::TrainState.bs_unravel`) hold one flat
    vector internally; checkpoints always store the named per-layer tree so they
    stay interchangeable with in-place-EMA states and the torch converter.
    """
    bs = state.variables.get("batch_stats", {})
    return dict(bs) if bs else {}


def save(ckpt_dir: str, step: int, state) -> str:
    """Save a TrainState (or any pytree) at `ckpt_dir/step_N`."""
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    tree = {
        "params": state.params,
        "batch_stats": _named_batch_stats(state),
        "opt_state": state.opt_state,
        "step": np.asarray(int(state.step)),
    }
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_") and d.split("_")[1].isdigit()]
    return max(steps) if steps else None


def restore(ckpt_dir: str, state, step: int | None = None):
    """Restore into an existing TrainState template (continue_train semantics)."""
    ocp = _ocp()
    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    template = {
        "params": state.params,
        "batch_stats": _named_batch_stats(state),
        "opt_state": state.opt_state,
        "step": np.asarray(int(state.step)),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
    new_bs = restored["batch_stats"]
    if getattr(state, "bs_unravel", None) is not None:
        # deferred-EMA state: re-flatten the named tree into the flat vector form
        from jax.flatten_util import ravel_pytree

        new_bs, _ = ravel_pytree(new_bs)
    return state.replace(
        params=restored["params"],
        batch_stats=new_bs,
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(int(restored["step"]), jax.numpy.int32),
    )
