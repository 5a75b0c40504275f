"""Checkpoint / resume (ref: tf.train.Supervisor + Saver(max_to_keep=0)).

orbax-checkpoint provides the same contract (SURVEY.md §5.4): step-based
saves into ``train_dir``, keep-all by default (reference ``max_to_keep=0``),
auto-restore-latest on startup, and the eval/inference processes polling
``latest_step()`` exactly like ``tf.train.latest_checkpoint``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper saving {params, batch_stats, opt_state, step}."""

    def __init__(self, train_dir: str, keep: Optional[int] = None):
        # keep=None → keep all (reference max_to_keep=0 semantics)
        self._dir = os.path.abspath(os.path.join(train_dir, "checkpoints"))
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=False
            ),
        )

    @property
    def directory(self) -> str:
        return self._dir

    def save(self, step: int, tree: Any) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(tree))
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore_latest(self, abstract_tree: Any = None) -> Optional[Any]:
        step = self._mngr.latest_step()
        if step is None:
            return None
        return self.restore(step, abstract_tree)

    def restore(self, step: int, abstract_tree: Any = None) -> Any:
        """Restore a step onto the CURRENT backend's devices.

        Without an abstract tree orbax replays the shardings recorded at
        save time, which fails when the saving and restoring topologies
        differ (train on CPU/one slice, infer on the TPU — 'Device
        TFRT_CPU_0 was not found').  We rebuild the abstract tree from the
        checkpoint's own metadata so arrays land on the default device of
        whatever backend is restoring."""
        if abstract_tree is None:
            abstract_tree = self._abstract_from_metadata(step)
        if abstract_tree is not None:
            return self._mngr.restore(
                step, args=ocp.args.StandardRestore(abstract_tree)
            )
        return self._mngr.restore(step)

    def _abstract_from_metadata(self, step: int):
        try:
            meta = ocp.StandardCheckpointer().metadata(
                os.path.join(self._dir, str(step), "default")
            )
            tree = getattr(meta, "item_metadata", meta)
            sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

            def to_abstract(m):
                shape = getattr(m, "shape", None)
                dtype = getattr(m, "dtype", None)
                if shape is None or dtype is None:
                    return m
                return jax.ShapeDtypeStruct(tuple(shape), dtype, sharding=sharding)

            abstract = jax.tree.map(to_abstract, dict(tree.tree))
            return abstract
        except Exception:  # noqa: BLE001 — fall back to orbax's default path
            return None

    def close(self):
        self._mngr.close()


def state_to_tree(state) -> dict:
    """TrainState → plain checkpointable pytree."""
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def tree_to_state(tree: dict, tx):
    from learnablepoolingmethods_tpu.core.train_state import TrainState

    return TrainState(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        tx=tx,
    )


def abstract_like(tree) -> Any:
    """Abstract restore target mirroring ``tree``, with shardings attached.

    orbax warns "sharding info not provided ... unsafe when restoring on a
    different topology" when any abstract leaf lacks a sharding.  Leaves
    that are live ``jax.Array``s keep their own sharding (so a sharded
    state restores sharded); host arrays get the default device — which is
    exactly the cross-topology contract ``CheckpointManager.restore``
    documents (arrays land on the restoring backend's devices)."""
    # local_devices()[0]: in multi-process mode every process restores its
    # own host copy, and jax.devices()[0] may not be addressable here.
    default = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

    def to_abstract(x):
        sharding = getattr(x, "sharding", None)
        if sharding is None or not isinstance(sharding, jax.sharding.Sharding):
            sharding = default
        return jax.ShapeDtypeStruct(
            jax.numpy.shape(x), getattr(x, "dtype", jax.numpy.asarray(x).dtype),
            sharding=sharding,
        )

    return jax.tree.map(to_abstract, tree)
