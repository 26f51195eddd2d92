"""LR range test — the reference's find_lr capability (train/find_lr.py).

The reference delegates to Lightning's tuner (``trainer.tuner.lr_find`` ->
``lr_finder.suggestion()``, train/find_lr.py:435-436), which runs an
exponential LR sweep and suggests the steepest-descent point. Same algorithm
here: sweep lr over ``num_steps`` log-spaced values, track smoothed loss,
stop on divergence (loss > early_stop_threshold x best), suggest the lr at
the steepest negative loss gradient.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import numpy as np
import optax


def lr_find(make_state: Callable[[optax.Schedule], object],
            train_step: Callable, batches: Iterable, rng: jax.Array,
            *, min_lr: float = 1e-8, max_lr: float = 1.0,
            num_steps: int = 100, smooth: float = 0.05,
            early_stop_threshold: float = 4.0) -> dict:
    """Returns {'suggestion', 'lrs', 'losses'}.

    ``make_state(schedule)`` builds a fresh train state whose optimizer uses
    the given schedule; ``train_step(state, batch, rng) -> (state, metrics)``
    must report ``train_loss``.
    """
    lrs = np.exp(np.linspace(np.log(min_lr), np.log(max_lr), num_steps))

    def schedule(step):
        import jax.numpy as jnp
        idx = jnp.clip(step, 0, num_steps - 1)
        return jnp.asarray(lrs)[idx]

    state = make_state(schedule)
    losses: list[float] = []
    avg, best = None, np.inf
    it = iter(batches)
    seen: list = []
    for i in range(num_steps):
        try:
            batch = next(it)
        except StopIteration:
            if not seen:
                break
            batch = seen[i % len(seen)]
        else:
            seen.append(batch)
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, batch, k)
        loss = float(metrics["train_loss"])
        if not np.isfinite(loss):
            break
        avg = loss if avg is None else smooth * loss + (1 - smooth) * avg
        losses.append(avg)
        best = min(best, avg)
        if avg > early_stop_threshold * best:
            break

    losses_a = np.asarray(losses)
    used_lrs = lrs[:len(losses_a)]
    if len(losses_a) < 3:
        return {"suggestion": None, "lrs": used_lrs, "losses": losses_a}
    # Lightning's suggestion(skip_begin=10, skip_end=1): the first points
    # are pure batch-to-batch noise at useless lrs (~min_lr) and the last
    # recorded point may be the divergence itself — a lucky downward blip
    # there would otherwise win argmin. Short sweeps fall back to the full
    # series (nothing left after skipping).
    skip_begin, skip_end = 10, 1
    if len(losses_a) >= skip_begin + skip_end + 3:
        core = np.gradient(losses_a[skip_begin:-skip_end])
        idx = int(np.argmin(core)) + skip_begin
    else:
        idx = int(np.argmin(np.gradient(losses_a)))
    suggestion = float(used_lrs[idx])
    return {"suggestion": suggestion, "lrs": used_lrs, "losses": losses_a}
