"""Train state: params + batch_stats + optax state, mesh-aware creation."""
from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    # When set, `batch_stats` is stored as ONE flat f32 vector (deferred-EMA BN,
    # models/layers.py::RawStatBatchNorm) and this callable restores the named
    # tree for eval/checkpoint consumers via the `variables` property.
    bs_unravel: Callable | None = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
        )

    @classmethod
    def create(cls, apply_fn, variables, tx):
        params = variables["params"]
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )

    @property
    def variables(self):
        v = {"params": self.params}
        bs = self.batch_stats
        if self.bs_unravel is not None:
            bs = self.bs_unravel(bs)
        if bs is not None and (not hasattr(bs, "__len__") or len(bs)):
            v["batch_stats"] = bs
        return v
