"""Tracing / profiling + metric writing (SURVEY.md §5.1, §5.5).

The reference's observability is TensorBoard scalar summaries written from
the train/eval loops (ref: utils.py#AddGlobalStepSummary/#AddEpochSummary)
with no profiler integration.  The rebuild provides:

- :class:`MetricWriter` — TensorBoard scalars via ``clu.metric_writers``
  (falls back to logging-only if TensorBoard isn't importable);
- :func:`profile_session` — ``jax.profiler`` trace capture around N steps,
  viewable in TensorBoard's profile plugin (``--profile_dir`` flag).
"""

from __future__ import annotations

import contextlib
from typing import Optional

from absl import logging


class MetricWriter:
    """Scalar summary writer with the reference's naming convention."""

    def __init__(self, logdir: Optional[str]):
        self._writer = None
        if logdir:
            try:
                from clu import metric_writers

                self._writer = metric_writers.create_default_writer(logdir)
            except Exception as e:  # noqa: BLE001 — degrade to logs
                logging.warning("TensorBoard writer unavailable (%s); logging only", e)

    def global_step_summary(self, step: int, hit_at_one, perr, gap, loss, examples_per_sec):
        """(ref: utils.py#AddGlobalStepSummary scalar names)."""
        self.write(
            step,
            {
                "model/Training_Hit@1": hit_at_one,
                "model/Training_Perr": perr,
                "model/Training_GAP": gap,
                "model/loss": loss,
                "global_step/Examples/Second": examples_per_sec,
            },
        )

    def epoch_summary(self, step: int, info: dict):
        """(ref: utils.py#AddEpochSummary scalar names)."""
        scalars = {
            "model/Eval_Hit@1": info["avg_hit_at_one"],
            "model/Eval_Perr": info["avg_perr"],
            "model/Eval_Loss": info["avg_loss"],
            "model/Eval_GAP": info["gap"],
        }
        if info.get("aps"):
            import numpy as np

            scalars["model/Eval_MAP"] = float(np.mean(info["aps"]))
        self.write(step, scalars)

    def write(self, step: int, scalars: dict):
        if self._writer is not None:
            self._writer.write_scalars(step, {k: float(v) for k, v in scalars.items()})

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


@contextlib.contextmanager
def profile_session(profile_dir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed steps (no-op if unset)."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", profile_dir)
