"""Orbax-backed checkpointing: best-k on a monitored metric + resume.

Parity with the reference's Lightning ``ModelCheckpoint(save_top_k=1,
save_weights_only=True, monitor="cos_sims", mode="max")``
(train/train.py:442-449), with async orbax saves and step-keyed restore for
the restartable train loop (SURVEY.md §5 failure-detection row).

Two retention sets, like Lightning's ``save_top_k`` + ``save_last``:

- ``best/``  — top-k by the monitored metric. Among EXACTLY tied values the
  earliest save survives (Lightning replaces only on strict ``torch.gt``
  improvement; orbax alone would keep the newest). Implemented by a
  1e-12 x save-ordinal penalty on the best_fn — the ordinal counts saves
  (epochs), so the penalty stays orders of magnitude below float32 metric
  resolution on any realistic run and only ever decides exact ties.
- ``last/``  — the most recent save, kept unconditionally so
  ``Trainer.fit(resume=True)`` continues from where training stopped even
  when the best checkpoint is many epochs old (best-only retention would
  silently re-train everything since the best epoch after a preemption).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, *, monitor: str = "cos_sims",
                 mode: str = "max", save_top_k: int = 1):
        self.monitor = monitor
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        sign = 1.0 if mode == "max" else -1.0
        best_options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=lambda m: (float(m[monitor])
                               - sign * 1e-12 * float(m.get("_ord", 0.0))),
            best_mode=mode,
            enable_async_checkpointing=True,
        )
        self._best = ocp.CheckpointManager(os.path.join(directory, "best"),
                                           options=best_options)
        # the last/ manager must stay SYNCHRONOUS: two async managers in
        # one process collide on orbax's global async-save barrier key
        # (ThreadSaveMultiHostValueHolder:set_value_start) under
        # jax.distributed — observed as a multi-process save deadlock.
        # The latest-state save is small and once per epoch; the monitored
        # best/ save keeps the async path.
        last_options = ocp.CheckpointManagerOptions(
            max_to_keep=1,
            enable_async_checkpointing=False,
        )
        self._last = ocp.CheckpointManager(os.path.join(directory, "last"),
                                           options=last_options)
        # save ordinal for tie-breaking; a resume must continue ABOVE every
        # ordinal still retained (the retained count is not enough: deleted
        # worse-metric saves may have consumed higher ordinals, and a new
        # save reusing one would tie-WIN an earlier retained best — the
        # opposite of the Lightning earliest-wins semantics)
        ords = []
        for s in self._best.all_steps():
            m = self._best.metrics(s)
            if m is not None:
                ords.append(float(m.get("_ord", 0.0)))
        self._ord = int(max(ords)) if ords else 0

    def save(self, step: int, state: Any, metrics: dict) -> None:
        self._ord += 1
        self._best.save(step, args=ocp.args.StandardSave(state),
                        metrics={self.monitor: float(metrics[self.monitor]),
                                 "_ord": float(self._ord)})
        self._last.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_like: Any, step: int | None = None) -> Any:
        """Restore the best checkpoint (default) or an explicit step —
        served from whichever retention set still holds that step."""
        step = step if step is not None else self.best_step()
        if step is None:
            raise FileNotFoundError("no checkpoint available")
        mgr = self._best if step in self._best.all_steps() else self._last
        return mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def best_step(self) -> int | None:
        return self._best.best_step()

    def latest_step(self) -> int | None:
        """The most recent save (the ``last/`` set survives best-k
        deletion), for resume."""
        steps = list(self._last.all_steps()) + list(self._best.all_steps())
        return max(steps) if steps else None

    def wait(self) -> None:
        self._best.wait_until_finished()
        self._last.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._best.close()
        self._last.close()
