"""Orbax-backed checkpointing: best-k on a monitored metric + resume.

Parity with the reference's Lightning ``ModelCheckpoint(save_top_k=1,
save_weights_only=True, monitor="cos_sims", mode="max")``
(train/train.py:442-449), with async orbax saves and step-keyed restore for
the restartable train loop (SURVEY.md §5 failure-detection row).
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
        # Lightning's ModelCheckpoint replaces only on STRICT improvement
        # (monitor_op is torch.gt/lt), so among exactly tied metric values
        # the EARLIEST epoch survives; orbax keeps the newest. A step
        # penalty far below metric resolution (1e-12 x step) reproduces the
        # reference's tie-breaking — it only ever decides exact ties.
        sign = 1.0 if mode == "max" else -1.0
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=lambda m: (float(m[monitor])
                               - sign * 1e-12 * float(m.get("_step", 0.0))),
            best_mode=mode,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, metrics: dict) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics={self.monitor: float(metrics[self.monitor]),
                                "_step": float(step)})

    def restore(self, state_like: Any, step: int | None = None) -> Any:
        step = step if step is not None else self._mgr.best_step()
        if step is None:
            raise FileNotFoundError("no checkpoint available")
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(state_like))

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
