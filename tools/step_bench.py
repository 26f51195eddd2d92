"""Re-measure backbone fwd / train-step timings on the real chip.

Purpose: PERF.md's EfficientNet/RexNet rows were measured before the
late-round-3 architecture correction (b3a final stage 7 -> 2 blocks,
rexnet channel ramp 170 -> 185 last block — see PERF.md header note);
this harness re-times the affected configs so the tables can be updated
with numbers that match the shipped (timm-exact) builders.

Timing per CLAUDE.md: batches generated ON device, params from
eval_shape + constant fill (a real init is ~70 s of host compiles and
timing doesn't depend on values), two warmups + forced np.asarray fetch,
then a dependency-chained fori_loop divided by iters (single dispatches
are floored by the ~28 ms remote RTT; the train-step chain carries the
evolving state so XLA cannot elide or overlap iterations).

Run on the real TPU:  python tools/step_bench.py [--iters 10] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NUM_CLASSES = 125          # Sketchy cat-label head, reference train.py


def _fill_variables(backbone, image_size, dtype):
    import jax
    import jax.numpy as jnp

    var_shapes = jax.eval_shape(
        lambda rng: backbone.init(rng, jnp.zeros((1, image_size, image_size,
                                                  3), dtype)),
        jax.random.key(0))
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                        var_shapes)


def bench_forward(model_name: str, batch: int, iters: int,
                  image_size: int = 224) -> dict:
    """Embed-forward ms/batch + img/s (the bench.py embed config)."""
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.models import create_model

    backbone = create_model(model_name, num_classes=NUM_CLASSES,
                            dtype=jnp.bfloat16)
    variables = _fill_variables(backbone, image_size, jnp.bfloat16)
    x = jax.random.uniform(jax.random.key(2),
                           (batch, image_size, image_size, 3),
                           dtype=jnp.bfloat16)

    @jax.jit
    def chain(v, x):
        def body(i, x):
            e = backbone.embed(v, x)
            return x + (e[0, 0] * 0).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    for _ in range(2):
        np.asarray(chain(variables, x)[:1, 0, 0, 0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(variables, x)[:1, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    return {"config": f"{model_name} bs{batch} fwd (embed)",
            "ms_per_batch": round(ms, 2),
            "img_per_sec": round(batch / (ms / 1e3), 1)}


def bench_train_step(model_name: str, batch: int, iters: int,
                     use_contrastive: bool, cos_margin: float,
                     con_margin: float, image_size: int = 224) -> dict:
    """Full triplet train step (fwd+bwd on 3*batch images, resident data)."""
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.config import TrainConfig
    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.train import (
        EmbedTrainState, build_train_step, make_optimizer)

    cfg = TrainConfig(model_name=model_name, batch_size=batch,
                      cos_margin=cos_margin, con_margin=con_margin,
                      use_contrastive=use_contrastive)
    backbone = create_model(model_name, num_classes=NUM_CLASSES,
                            dtype=cfg.compute_dtype)
    variables = _fill_variables(backbone, image_size, cfg.compute_dtype)
    tx = make_optimizer("Adam", cfg.learning_rate, cfg.weight_decay)
    state = EmbedTrainState.from_backbone(backbone, variables, tx)
    step = build_train_step(backbone, cfg)

    key = jax.random.key(3)
    imgs = {r: jax.random.uniform(
                jax.random.fold_in(key, i),
                (batch, image_size, image_size, 3), dtype=cfg.compute_dtype)
            for i, r in enumerate(("qry", "pos", "neg"))}
    bdict = {"qry": imgs["qry"], "pos": [imgs["pos"]], "neg": [imgs["neg"]],
             "cat_idx": jnp.arange(batch, dtype=jnp.int32) % NUM_CLASSES,
             "prod_idx": jnp.arange(batch, dtype=jnp.int32) % NUM_CLASSES}
    rng = jax.random.key(4)

    @jax.jit
    def chain(state, bdict, rng):
        def body(i, st):
            st, _metrics = step(st, bdict, rng)
            return st
        return jax.lax.fori_loop(0, iters, body, state)

    for _ in range(2):
        np.asarray(chain(state, bdict, rng).step)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(state, bdict, rng).step)
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    mode = "cos_con_ce" if use_contrastive else "cos_ce"
    return {"config": f"{model_name} bs{batch} {mode} train step",
            "ms_per_step": round(ms, 2),
            "img_per_sec": round(3 * batch / (ms / 1e3), 1)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default=None)
    p.add_argument("--only", default=None,
                   help="comma list of fwd,b3a,rexnet to restrict")
    args = p.parse_args()
    want = set(args.only.split(",")) if args.only else {"fwd", "b3a",
                                                        "rexnet"}
    results = []
    if "fwd" in want:
        results.append(bench_forward("efficientnet_b3a", 256, args.iters))
        print(json.dumps(results[-1]), flush=True)
    if "b3a" in want:
        results.append(bench_train_step(
            "efficientnet_b3a", 64, args.iters, use_contrastive=True,
            cos_margin=0.3, con_margin=0.3))
        print(json.dumps(results[-1]), flush=True)
    if "rexnet" in want:
        results.append(bench_train_step(
            "rexnet_200", 64, args.iters, use_contrastive=True,
            cos_margin=0.3, con_margin=0.3))
        print(json.dumps(results[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
