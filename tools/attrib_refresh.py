"""Refresh the PERF.md attribution ratios on the CORRECTED builders
(VERDICT r3 task 8): the EfficientNet depthwise/thin-MXU split and the
Swin window-attention share were measured before the late-round-3
architecture fix (b3a final stage 7 -> 2 blocks). One cheap ablation
pair each — NOT a re-litigation of the settled Pallas-depthwise /
fused-floor experiments.

Method (same as round 3, but on the chained harness from step_bench.py):
- EfficientNet: full b3a bs256 embed-forward vs the same model with every
  depthwise conv's kernel forced to 1x1 (stride/groups kept) — the delta
  is the spatial-stencil cost; the remainder is thin-channel MXU work.
- Swin: full swin_s3_tiny T4 train step (bs64 triplets, embed-only
  cos 0.2) vs the same with the attention math removed (qkv + output
  proj kept, scores/bias/softmax/weighted-sum dropped) — the delta is
  the window-attention math.

Each ablated arm re-inits its own (differently-shaped) params; timings
use eval_shape + constant fill per step_bench.py.

Run on the real TPU:  python -u tools/attrib_refresh.py [--iters 10]
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

from step_bench import NUM_CLASSES, _fill_variables, bench_forward  # noqa: E402


def patch_depthwise_1x1():
    """Swap efficientnet.MBConv for a variant whose conv_dw is 1x1."""
    import flax.linen as nn

    from imageretrievalresearch_tpu.models import efficientnet as eff
    from imageretrievalresearch_tpu.models.layers import (
        ConvBnAct,
        DropPath,
        SqueezeExcite,
        make_divisible,
    )

    orig = eff.MBConv

    class MBConvDW1(eff.MBConv):
        @nn.compact
        def __call__(self, x, train: bool = False):
            in_chs = x.shape[-1]
            shortcut = x
            mid = make_divisible(in_chs * self.expand_ratio)
            if self.expand_ratio != 1:
                x = ConvBnAct(mid, 1, act=nn.silu, dtype=self.dtype,
                              name="conv_pw")(x, train)
            # ABLATION: kernel forced 1x1 (stride/groups kept)
            x = ConvBnAct(mid, 1, stride=self.stride, groups=mid,
                          act=nn.silu, dtype=self.dtype,
                          name="conv_dw")(x, train)
            if self.se_ratio > 0:
                rd = max(1, int(in_chs * self.se_ratio))
                x = SqueezeExcite(rd, act=nn.silu, dtype=self.dtype,
                                  name="se")(x, train)
            x = ConvBnAct(self.out_chs, 1, act=None, dtype=self.dtype,
                          name="conv_pwl")(x, train)
            if self.stride == 1 and in_chs == self.out_chs:
                x = (DropPath(self.drop_path, name="drop_path")(x, train)
                     + shortcut)
            return x

    eff.MBConv = MBConvDW1
    return lambda: setattr(eff, "MBConv", orig)


def patch_no_attn_math():
    """Swap swin.WindowAttention for qkv -> v -> proj (no attention)."""
    import flax.linen as nn

    from imageretrievalresearch_tpu.models import swin as sw

    orig = sw.WindowAttention

    class WindowNoAttn(sw.WindowAttention):
        @nn.compact
        def __call__(self, x, mask=None, train: bool = False):
            bn, n, c = x.shape
            head_dim = c // self.num_heads
            qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype,
                           name="qkv")(x)
            qkv = qkv.reshape(bn, n, 3, self.num_heads, head_dim)
            v = qkv[:, :, 2].transpose(0, 2, 1, 3)
            # ABLATION: scores/bias/softmax/weighted-sum dropped
            out = v.transpose(0, 2, 1, 3).reshape(bn, n, c)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)

    sw.WindowAttention = WindowNoAttn
    return lambda: setattr(sw, "WindowAttention", orig)


def bench_swin_t4_step(iters: int, batch: int = 64,
                       image_size: int = 224) -> dict:
    """swin_s3_tiny T4 train step (embed-only, cos 0.2), chained timing."""
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.config import TrainConfig
    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.train import (
        EmbedTrainState,
        build_train_step,
        make_optimizer,
    )

    cfg = TrainConfig(model_name="swin_s3_tiny_224", batch_size=batch,
                      cos_margin=0.2, only_feature_embeddings=True,
                      only_target_labels=None)
    assert cfg.loss_mode == "cos_only"
    backbone = create_model(cfg.model_name, num_classes=NUM_CLASSES,
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
            st, _ = step(st, bdict, rng)
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
    return {"ms_per_step": round(ms, 2),
            "img_per_sec": round(3 * batch / (ms / 1e3), 1)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--only", default=None, help="effnet | swin")
    args = p.parse_args()
    out = {}

    if args.only in (None, "effnet"):
        full = bench_forward("efficientnet_b3a", 256, args.iters)
        print(json.dumps({"b3a_fwd_full": full}), flush=True)
        restore = patch_depthwise_1x1()
        try:
            abl = bench_forward("efficientnet_b3a", 256, args.iters)
        finally:
            restore()
        dw = full["ms_per_batch"] - abl["ms_per_batch"]
        out["effnet"] = {
            "full_ms": full["ms_per_batch"], "dw1x1_ms": abl["ms_per_batch"],
            "depthwise_ms": round(dw, 2),
            "depthwise_share": round(dw / full["ms_per_batch"], 3)}
        print(json.dumps({"effnet": out["effnet"]}), flush=True)

    if args.only in (None, "swin"):
        full = bench_swin_t4_step(args.iters)
        print(json.dumps({"swin_t4_full": full}), flush=True)
        restore = patch_no_attn_math()
        try:
            abl = bench_swin_t4_step(args.iters)
        finally:
            restore()
        attn = full["ms_per_step"] - abl["ms_per_step"]
        out["swin"] = {
            "full_ms": full["ms_per_step"], "no_attn_ms": abl["ms_per_step"],
            "attn_math_ms": round(attn, 2),
            "attn_share": round(attn / full["ms_per_step"], 3)}
        print(json.dumps({"swin": out["swin"]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
