"""Train state: params + BN stats + optimizer state, one pytree.

Replaces the reference's TF1 graph variables + Supervisor-managed global_step
(ref: train.py#build_graph).  A single flax struct keeps the whole training
state shardable/checkpointable as one tree.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        if hasattr(self.tx, "fused_apply"):
            # FusedAdam (ops/fused_adam.py): returns new params directly so
            # the update stays one VMEM pass — optax's (updates, apply) split
            # would force an extra delta tree through HBM.
            new_params, new_opt_state = self.tx.fused_apply(
                grads, self.opt_state, self.params
            )
        else:
            updates, new_opt_state = self.tx.update(
                grads, self.opt_state, self.params
            )
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, params, batch_stats, tx):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )
