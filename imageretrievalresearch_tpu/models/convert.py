"""Checkpoint loading: torch/timm state-dict -> Flax conversion, orbax restore.

Covers the reference's checkpoint surfaces:

- PyTorch-Lightning ``.ckpt`` with a ``state_dict`` whose keys carry a
  ``model.`` prefix that must be stripped (inference/inference.py:114-124) —
  the published checkpoints (checkpoints/checkpoints_path.txt) are this kind;
- plain torch ``.pth`` state dicts;
- this framework's own orbax checkpoint directories.

Tensor layout conversion: Conv OIHW -> HWIO (depthwise (C,1,k,k) ->
(k,k,1,C)), Linear (out,in) -> (in,out), BatchNorm weight/bias ->
scale/bias + running stats. Key mapping is per-family (timm naming, pinned
by tests with synthetic torch state dicts; real-timm parity is validated
when timm is importable).
"""

from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# tensor layout
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray, groups: int = 1) -> np.ndarray:
    """torch OIHW -> flax HWIO ((k,k,in/groups,out); depthwise handled by
    groups == out channels)."""
    return np.transpose(w, (2, 3, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _tn(t) -> np.ndarray:
    """torch tensor -> numpy (works for cpu tensors and numpy already)."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_model_prefix(state_dict: dict) -> dict:
    """Lightning 'model.' prefix strip (inference/inference.py:117-121)."""
    return {k.replace("model.", "", 1) if k.startswith("model.") else k: v
            for k, v in state_dict.items()}


# ---------------------------------------------------------------------------
# per-family key mapping: torch timm name -> (flax path tuple, kind)
# kind: conv | dw_conv | linear | bn_scale | bn_bias | bn_mean | bn_var | bias
# ---------------------------------------------------------------------------

def _cba(dst: tuple, src: str, mapping: dict) -> None:
    """timm ConvBnAct '<src>.conv.*' / '<src>.bn.*' -> our ConvBnAct dst."""
    mapping[f"{src}.conv.weight"] = (dst + ("conv", "kernel"), "conv")
    for t_suf, kind in (("weight", "bn_scale"), ("bias", "bn_bias"),
                        ("running_mean", "bn_mean"),
                        ("running_var", "bn_var")):
        ours = {"bn_scale": "scale", "bn_bias": "bias",
                "bn_mean": "mean", "bn_var": "var"}[kind]
        mapping[f"{src}.bn.{t_suf}"] = (dst + ("bn", ours), kind)


def _bare_conv_bn(dst: tuple, conv_src: str, bn_src: str,
                  mapping: dict) -> None:
    """timm bare 'convX.weight' + 'bnY.*' pair -> our ConvBnAct dst."""
    mapping[f"{conv_src}.weight"] = (dst + ("conv", "kernel"), "conv")
    for t_suf, ours, kind in (("weight", "scale", "bn_scale"),
                              ("bias", "bias", "bn_bias"),
                              ("running_mean", "mean", "bn_mean"),
                              ("running_var", "var", "bn_var")):
        mapping[f"{bn_src}.{t_suf}"] = (dst + ("bn", ours), kind)


def efficientnet_key_map(width_mult: float, depth_mult: float) -> dict:
    """timm EfficientNet naming -> our module paths.

    timm blocks: stage 0 DepthwiseSeparable (conv_dw/bn1, se, conv_pw/bn2);
    stages 1+ InvertedResidual (conv_pw/bn1, conv_dw/bn2, se, conv_pwl/bn3).
    """
    import math
    from imageretrievalresearch_tpu.models.efficientnet import _B0_STAGES

    m: dict = {}
    ff = ("forward_features",)
    _bare_conv_bn(ff + ("conv_stem",), "conv_stem", "bn1", m)
    for sidx, (_, _, r, _, e) in enumerate(_B0_STAGES):
        reps = int(math.ceil(depth_mult * r))
        for i in range(reps):
            t = f"blocks.{sidx}.{i}"
            dst = ff + (f"blocks_{sidx}_{i}",)
            if e == 1:
                _bare_conv_bn(dst + ("conv_dw",), f"{t}.conv_dw", f"{t}.bn1", m)
                m[f"{t}.se.conv_reduce.weight"] = (dst + ("se", "conv_reduce", "kernel"), "conv")
                m[f"{t}.se.conv_reduce.bias"] = (dst + ("se", "conv_reduce", "bias"), "bias")
                m[f"{t}.se.conv_expand.weight"] = (dst + ("se", "conv_expand", "kernel"), "conv")
                m[f"{t}.se.conv_expand.bias"] = (dst + ("se", "conv_expand", "bias"), "bias")
                _bare_conv_bn(dst + ("conv_pwl",), f"{t}.conv_pw", f"{t}.bn2", m)
            else:
                _bare_conv_bn(dst + ("conv_pw",), f"{t}.conv_pw", f"{t}.bn1", m)
                _bare_conv_bn(dst + ("conv_dw",), f"{t}.conv_dw", f"{t}.bn2", m)
                m[f"{t}.se.conv_reduce.weight"] = (dst + ("se", "conv_reduce", "kernel"), "conv")
                m[f"{t}.se.conv_reduce.bias"] = (dst + ("se", "conv_reduce", "bias"), "bias")
                m[f"{t}.se.conv_expand.weight"] = (dst + ("se", "conv_expand", "kernel"), "conv")
                m[f"{t}.se.conv_expand.bias"] = (dst + ("se", "conv_expand", "bias"), "bias")
                _bare_conv_bn(dst + ("conv_pwl",), f"{t}.conv_pwl", f"{t}.bn3", m)
    _bare_conv_bn(ff + ("conv_head",), "conv_head", "bn2", m)
    m["classifier.weight"] = (("head", "classifier", "kernel"), "linear")
    m["classifier.bias"] = (("head", "classifier", "bias"), "bias")
    return m


def rexnet_key_map(width_mult: float, depth_mult: float,
                   ch_div: int = 1) -> dict:
    """timm RexNet naming -> our module paths.

    timm: stem (ConvBnAct), features.{i} LinearBottleneck with
    conv_exp/conv_dw (ConvBnAct) + SEWithNorm (fc1, bn, fc2) + conv_pwl;
    features.{N} final ConvBnAct; head.fc Linear.
    """
    from imageretrievalresearch_tpu.models.rexnet import rexnet_block_cfg

    m: dict = {}
    ff = ("forward_features",)
    _cba(ff + ("stem",), "stem", m)
    cfg = rexnet_block_cfg(width_mult, depth_mult, ch_div=ch_div)
    for i, (_, e, _, se) in enumerate(cfg):
        t = f"features.{i}"
        dst = ff + (f"features_{i}",)
        if e != 1:
            _cba(dst + ("conv_exp",), f"{t}.conv_exp", m)
        _cba(dst + ("conv_dw",), f"{t}.conv_dw", m)
        if se > 0:
            m[f"{t}.se.fc1.weight"] = (dst + ("se", "conv_reduce", "kernel"), "conv")
            m[f"{t}.se.fc1.bias"] = (dst + ("se", "conv_reduce", "bias"), "bias")
            _bn = dst + ("se", "bn")
            for t_suf, ours, kind in (("weight", "scale", "bn_scale"),
                                      ("bias", "bias", "bn_bias"),
                                      ("running_mean", "mean", "bn_mean"),
                                      ("running_var", "var", "bn_var")):
                m[f"{t}.se.bn.{t_suf}"] = (_bn + (ours,), kind)
            m[f"{t}.se.fc2.weight"] = (dst + ("se", "conv_expand", "kernel"), "conv")
            m[f"{t}.se.fc2.bias"] = (dst + ("se", "conv_expand", "bias"), "bias")
        _cba(dst + ("conv_pwl",), f"{t}.conv_pwl", m)
    _cba(ff + ("final_conv",), f"features.{len(cfg)}", m)
    m["head.fc.weight"] = (("head", "fc", "kernel"), "linear")
    m["head.fc.bias"] = (("head", "fc", "bias"), "bias")
    return m


def resnet_key_map(layers) -> dict:
    """timm ResNet naming -> our module paths (Bottleneck blocks)."""
    m: dict = {}
    ff = ("forward_features",)
    m["conv1.weight"] = (ff + ("conv1", "kernel"), "conv")
    for t_suf, ours, kind in (("weight", "scale", "bn_scale"),
                              ("bias", "bias", "bn_bias"),
                              ("running_mean", "mean", "bn_mean"),
                              ("running_var", "var", "bn_var")):
        m[f"bn1.{t_suf}"] = (ff + ("bn1", ours), kind)
    for sidx, blocks in enumerate(layers):
        for i in range(blocks):
            t = f"layer{sidx + 1}.{i}"
            dst = ff + (f"layer{sidx + 1}_{i}",)
            for conv in ("conv1", "conv2", "conv3"):
                bnn = conv.replace("conv", "bn")
                m[f"{t}.{conv}.weight"] = (dst + (conv, "kernel"), "conv")
                for t_suf, ours, kind in (("weight", "scale", "bn_scale"),
                                          ("bias", "bias", "bn_bias"),
                                          ("running_mean", "mean", "bn_mean"),
                                          ("running_var", "var", "bn_var")):
                    m[f"{t}.{bnn}.{t_suf}"] = (dst + (bnn, ours), kind)
            if i == 0:  # only the first block of each stage has a downsample
                m[f"{t}.downsample.0.weight"] = (
                    dst + ("downsample_conv", "kernel"), "conv")
                for t_suf, ours, kind in (("weight", "scale", "bn_scale"),
                                          ("bias", "bias", "bn_bias"),
                                          ("running_mean", "mean", "bn_mean"),
                                          ("running_var", "var", "bn_var")):
                    m[f"{t}.downsample.1.{t_suf}"] = (
                        dst + ("downsample_bn", ours), kind)
    m["fc.weight"] = (("head", "fc", "kernel"), "linear")
    m["fc.bias"] = (("head", "fc", "bias"), "bias")
    return m


def darknet_key_map(depths) -> dict:
    """Modern-timm cspnet darknet53 naming -> our module paths.

    timm: stem.conv1.{conv,bn}; stages.{s}.conv_down.{conv,bn};
    stages.{s}.blocks.{b}.conv{1,2}.{conv,bn}; head.fc. (timm 0.4.12 — the
    reference's pin — has no darknet53 at all; see models/darknet.py.)
    """
    m: dict = {}
    ff = ("forward_features",)
    bn_fields = (("weight", "scale", "bn_scale"), ("bias", "bias", "bn_bias"),
                 ("running_mean", "mean", "bn_mean"),
                 ("running_var", "var", "bn_var"))

    def conv_bn(t_prefix, conv_dst, bn_dst):
        m[f"{t_prefix}.conv.weight"] = (ff + conv_dst + ("kernel",), "conv")
        for t_suf, ours, kind in bn_fields:
            m[f"{t_prefix}.bn.{t_suf}"] = (ff + bn_dst + (ours,), kind)

    conv_bn("stem.conv1", ("stem_conv",), ("stem_bn",))
    for s, depth in enumerate(depths):
        conv_bn(f"stages.{s}.conv_down",
                (f"stage{s}_down_conv",), (f"stage{s}_down_bn",))
        for b in range(depth):
            blk = f"stage{s}_block{b}"
            conv_bn(f"stages.{s}.blocks.{b}.conv1",
                    (blk, "conv1"), (blk, "bn1"))
            conv_bn(f"stages.{s}.blocks.{b}.conv2",
                    (blk, "conv2"), (blk, "bn2"))
    m["head.fc.weight"] = (("head", "fc", "kernel"), "linear")
    m["head.fc.bias"] = (("head", "fc", "bias"), "bias")
    return m


def swin_key_map(depths, num_heads) -> dict:
    """timm SwinTransformer naming -> our module paths.

    timm: patch_embed.proj/.norm; layers.{s}.blocks.{b}. with norm1,
    attn.{qkv,proj,relative_position_bias_table}, norm2, mlp.{fc1,fc2};
    layers.{s}.downsample.{norm,reduction}; final norm; head(.fc).
    (relative_position_index buffers are recomputed, not converted.)
    """
    m: dict = {}
    ff = ("forward_features",)

    def dense(dst: tuple, src: str, bias: bool = True) -> None:
        m[f"{src}.weight"] = (dst + ("kernel",), "linear")
        if bias:
            m[f"{src}.bias"] = (dst + ("bias",), "bias")

    def ln(dst: tuple, src: str) -> None:
        m[f"{src}.weight"] = (dst + ("scale",), "bias")
        m[f"{src}.bias"] = (dst + ("bias",), "bias")

    m["patch_embed.proj.weight"] = (ff + ("patch_embed", "kernel"), "conv")
    m["patch_embed.proj.bias"] = (ff + ("patch_embed", "bias"), "bias")
    ln(ff + ("patch_norm",), "patch_embed.norm")
    for s, depth in enumerate(depths):
        for b in range(depth):
            t = f"layers.{s}.blocks.{b}"
            dst = ff + (f"layers_{s}_blocks_{b}",)
            ln(dst + ("norm1",), f"{t}.norm1")
            dense(dst + ("attn", "qkv"), f"{t}.attn.qkv")
            dense(dst + ("attn", "proj"), f"{t}.attn.proj")
            m[f"{t}.attn.relative_position_bias_table"] = (
                dst + ("attn", "relative_position_bias_table"), "raw")
            ln(dst + ("norm2",), f"{t}.norm2")
            dense(dst + ("mlp_fc1",), f"{t}.mlp.fc1")
            dense(dst + ("mlp_fc2",), f"{t}.mlp.fc2")
        if s < len(depths) - 1:
            t = f"layers.{s}.downsample"
            dst = ff + (f"layers_{s}_downsample",)
            ln(dst + ("norm",), f"{t}.norm")
            dense(dst + ("reduction",), f"{t}.reduction", bias=False)
    ln(ff + ("norm",), "norm")
    # timm swin head is `head` (Linear) in 0.4.x / `head.fc` in newer timm
    dense(("head", "fc"), "head")
    return m


_FAMILY_MAPPERS = {
    r"^efficientnet": lambda net: efficientnet_key_map(net.width_mult,
                                                       net.depth_mult),
    r"^rexnet": lambda net: rexnet_key_map(net.width_mult, net.depth_mult,
                                           net.ch_div),
    r"^swin": lambda net: swin_key_map(net.depths, net.num_heads),
    r"^(ig_)?resne(t|xt)": lambda net: resnet_key_map(net.layers),
    r"^darknet": lambda net: darknet_key_map(net.depths),
}


def key_map_for(backbone) -> dict:
    for pat, fn in _FAMILY_MAPPERS.items():
        if re.match(pat, backbone.name):
            return fn(backbone.net)
    raise NotImplementedError(
        f"no torch key mapping for family of {backbone.name!r} yet")


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------

# torch/timm state dicts carry non-parameter buffers that have no Flax
# counterpart: BN bookkeeping (num_batches_tracked) and Swin's recomputed
# relative_position_index / attn_mask. They must not trip the strict check
# on real Lightning checkpoints (inference/inference.py:114-124 loads them
# with the full buffer set present).
_NONPARAM_BUFFER_RE = re.compile(
    r"(^|\.)(num_batches_tracked|relative_position_index|attn_mask)$")


# The reference's conv_input model is ``nn.Sequential(Sequential(conv,
# SiLU), base_model)`` (inference/inference.py:101-105), so a
# conv_input-trained state dict carries the stem conv at ``0.0.weight``
# and every timm key under a ``1.`` prefix.
_STEM_TORCH_KEY = "0.0.weight"


def convert_torch_state_dict(state_dict: dict, backbone,
                             variables: dict, *, strict: bool = True) -> dict:
    """Map a (prefix-stripped) torch state dict onto freshly-initialized
    variables, with shape checks. Returns updated variables."""
    state_dict = {k: v for k, v in state_dict.items()
                  if not _NONPARAM_BUFFER_RE.search(k)}
    stem_kernel = None
    if getattr(backbone, "stem", None) is not None:
        if _STEM_TORCH_KEY in state_dict:
            # conv_input-trained checkpoint: consume the stem conv and
            # unwrap the Sequential's '1.' prefix from the timm keys
            stem_kernel = _conv_kernel(_tn(state_dict.pop(_STEM_TORCH_KEY)))
            state_dict = {(k[2:] if k.startswith("1.") else k): v
                          for k, v in state_dict.items()}
        elif strict:
            raise ValueError(
                f"conv_input backbone but no {_STEM_TORCH_KEY!r} stem key in "
                "the state dict — a base (stem-less) checkpoint loads into a "
                "conv_input model only with strict=False (random stem, the "
                "reference's strict=False behavior, inference.py:124)")
    mapping = key_map_for(backbone)
    params = jax.tree.map(np.asarray, variables["net"]["params"])
    stats = jax.tree.map(np.asarray,
                         variables["net"].get("batch_stats", {}))
    used, missing = set(), []

    def assign(tree: dict, path: tuple, value: np.ndarray,
               torch_key: str) -> bool:
        node = tree
        for p in path[:-1]:
            if p not in node:
                if strict:
                    raise KeyError(f"{torch_key}: no flax path {path}")
                return False
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            if strict:
                raise KeyError(f"{torch_key}: no flax leaf {path}")
            return False
        if node[leaf].shape != value.shape:
            raise ValueError(
                f"{torch_key}: shape {value.shape} != flax {path} "
                f"{node[leaf].shape}")
        node[leaf] = value.astype(node[leaf].dtype)
        return True

    for tkey, (path, kind) in mapping.items():
        if tkey not in state_dict:
            missing.append(tkey)
            continue
        val = _tn(state_dict[tkey])
        if kind == "conv":
            val = _conv_kernel(val)
        elif kind == "linear":
            val = _linear_kernel(val)
        if kind in ("bn_mean", "bn_var"):
            ok = assign(stats, path, val, tkey)
        else:
            ok = assign(params, path, val, tkey)
        if ok:
            used.add(tkey)

    extra = set(state_dict) - used
    if strict and (missing or extra):
        raise ValueError(
            f"state dict mismatch: missing={missing[:8]} "
            f"unused={sorted(extra)[:8]}")

    out = dict(variables)
    net = dict(variables["net"])
    net["params"] = jax.tree.map(jnp.asarray, params)
    if stats:
        net["batch_stats"] = jax.tree.map(jnp.asarray, stats)
    out["net"] = net
    if stem_kernel is not None:
        want = variables["stem"]["params"]["conv"]["kernel"]
        if tuple(stem_kernel.shape) != tuple(want.shape):
            raise ValueError(
                f"{_STEM_TORCH_KEY}: shape {stem_kernel.shape} != flax stem "
                f"kernel {tuple(want.shape)}")
        out["stem"] = {"params": {"conv": {
            "kernel": jnp.asarray(stem_kernel.astype(np.asarray(want).dtype))
        }}}
    return out


def export_torch_state_dict(backbone, variables, *, lightning: bool = False,
                            template: dict | None = None,
                            strict: bool = True) -> dict:
    """Flax variables -> torch/timm state dict (inverse of
    :func:`convert_torch_state_dict`).

    Lets a model trained in this framework round-trip back into the
    reference's torch tooling (inference/inference.py:114-124 loads exactly
    this shape of dict): conv kernels go HWIO -> OIHW, linear kernels
    (in,out) -> (out,in), BN scale/bias/stats regain their timm names.

    ``lightning=True`` prefixes every key with ``model.`` — the layout the
    published Lightning checkpoints use and the reference strips on load.

    ``template`` (optional): a torch ``state_dict()`` from the target torch
    module. Exported tensors are overlaid onto a copy of it, so
    non-parameter buffers the mapping does not produce (BN
    ``num_batches_tracked``, Swin's recomputed ``relative_position_index`` /
    ``attn_mask``) keep the template's values and
    ``load_state_dict(strict=True)`` passes. Without a template, BN
    ``num_batches_tracked`` zeros are still synthesized (every plain-torch
    BN checkpoint carries them); Swin's recomputed buffers are not — load
    with ``strict=False`` or supply a template for those.
    """
    try:
        import torch
    except ImportError:  # export still works; values stay numpy
        torch = None

    mapping = key_map_for(backbone)
    params = variables["net"]["params"]
    stats = variables["net"].get("batch_stats", {})

    def fetch(path: tuple, kind: str, torch_key: str):
        node = stats if kind in ("bn_mean", "bn_var") else params
        for p in path:
            if not isinstance(node, dict) or p not in node:
                if strict:
                    raise KeyError(
                        f"{torch_key}: flax path {path} not in variables")
                return None
            node = node[p]
        val = np.asarray(node, dtype=np.float32)
        if kind == "conv":
            val = np.transpose(val, (3, 2, 0, 1))    # HWIO -> OIHW
        elif kind == "linear":
            val = np.transpose(val, (1, 0))          # (in,out) -> (out,in)
        # writable contiguous copy: jax buffers are read-only through
        # np.asarray, and torch.from_numpy rejects non-writable views
        return np.array(val, copy=True, order="C")

    # conv_input backbones export the reference's Sequential layout:
    # stem conv at '0.0.weight', timm keys under '1.' (inference.py:101-105)
    seq = "1." if getattr(backbone, "stem", None) is not None else ""

    def out_key_for(tkey: str) -> str:
        k = f"{seq}{tkey}"
        return f"model.{k}" if lightning else k

    sd: dict = dict(template) if template is not None else {}
    if template is not None and lightning:
        sd = {f"model.{k}": v for k, v in sd.items()}
    if seq:
        if "stem" not in variables:
            raise KeyError(
                "conv_input backbone but variables carry no 'stem' entry")
        kern = np.transpose(
            np.asarray(variables["stem"]["params"]["conv"]["kernel"],
                       dtype=np.float32), (3, 2, 0, 1)).copy()
        stem_key = (f"model.{_STEM_TORCH_KEY}" if lightning
                    else _STEM_TORCH_KEY)
        sd[stem_key] = torch.from_numpy(kern) if torch is not None else kern
    for tkey, (path, kind) in mapping.items():
        val = fetch(path, kind, tkey)
        if val is None:
            continue
        out_key = out_key_for(tkey)
        if template is not None and out_key not in sd:
            if strict:
                raise KeyError(
                    f"{tkey}: not present in the provided template")
            continue
        sd[out_key] = torch.from_numpy(val) if torch is not None else val
    if template is None:
        # plain-torch BN state dicts always carry num_batches_tracked
        for tkey, (_, kind) in mapping.items():
            if kind != "bn_var":
                continue
            nbt = tkey.rsplit(".", 1)[0] + ".num_batches_tracked"
            out_key = out_key_for(nbt)
            sd[out_key] = (torch.zeros((), dtype=torch.long)
                           if torch is not None
                           else np.zeros((), dtype=np.int64))
    return sd


def load_checkpoint(checkpoint_path: str, backbone,
                    *, sample_shape: tuple = (1, 224, 224, 3),
                    from_pytorch_lightning: bool = True,
                    strict: bool = True, seed: int = 0) -> dict:
    """timm/PL/orbax-agnostic load (reference load_checkpoint,
    inference/inference.py:77-149). Empty path -> random init (the
    reference's pretrained=False branch)."""
    rng = jax.random.key(seed)
    variables = backbone.init(rng, jnp.zeros(sample_shape))
    if not checkpoint_path:
        print(f"Model {backbone.name} randomly initialized "
              "(no checkpoint given)")
        return variables
    if os.path.isdir(checkpoint_path):  # our orbax layouts
        import orbax.checkpoint as ocp

        path = os.path.abspath(checkpoint_path)
        # Trainer CheckpointManager layout: best/ (top-k by monitor) +
        # last/ (most recent, for resume). Prefer the best set; fall back
        # to last/ when best/ is empty. Older flat layouts keep working.
        for sub in ("best", "last"):
            subpath = os.path.join(path, sub)
            if os.path.isdir(subpath) and any(
                    d.isdigit() for d in os.listdir(subpath)):
                path = subpath
                break
        step_dirs = [d for d in os.listdir(path)
                     if d.isdigit() and os.path.isdir(os.path.join(path, d))]
        if step_dirs:
            # a Trainer CheckpointManager directory: restore the best/latest
            # step's EmbedTrainState and extract the backbone variables
            mgr = ocp.CheckpointManager(path)
            step = mgr.best_step()
            if step is None:
                step = mgr.latest_step()
            restored = mgr.restore(step)
            mgr.close()
            state = restored if isinstance(restored, dict) else restored
            params = state["params"]
            batch_stats = state.get("batch_stats") or {}
            out = {}
            for key in params:
                v = {"params": params[key]}
                if batch_stats and key in batch_stats:
                    v["batch_stats"] = batch_stats[key]
                out[key] = v
            print(f"Model {backbone.name} trainer checkpoint (step {step}) "
                  "loaded")
            return out
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, variables)
        print(f"Model {backbone.name} orbax checkpoint loaded")
        return restored
    import torch
    payload = torch.load(checkpoint_path, map_location="cpu",
                         weights_only=False)
    state_dict = payload.get("state_dict", payload) \
        if isinstance(payload, dict) else payload
    if from_pytorch_lightning:
        state_dict = strip_model_prefix(state_dict)
    variables = convert_torch_state_dict(state_dict, backbone, variables,
                                         strict=strict)
    print(f"Model {backbone.name} trained checkpoint successfully converted")
    return variables
