"""ZeRO-3-style parameter + optimizer sharding ("FSDP") over the data axis.

The reference's only strategy is replicated-state DDP (train/train.py:439);
at its model scale (<60M params) that is fine. This module is the TPU-native
scale-out path the reference never needed: every large parameter (and its
Adam moments, which share the pytree structure) lives sharded across the
mesh's ``data`` axis, so per-chip state memory is ~``total/n_devices``. XLA's
GSPMD partitioner derives the collectives from the shardings alone — an
all-gather materializes each parameter where the forward/backward consumes
it, and the gradient/optimizer update stays sharded (the reduce-scatter
pattern) — no hand-written collectives, exactly like the DP path in
``parallel/mesh.py``.

Sharding rule (``fsdp_spec``): for each array leaf, shard the LARGEST dim
divisible by the axis size, preferring the trailing dim on ties (conv kernels
are HWIO and dense kernels are (in, out) — the output-feature dim is usually
both the largest and the contraction-friendly one). Leaves smaller than
``min_elems`` (biases, BN scales/stats, scalars like ``step``) and leaves
with no divisible dim (e.g. RexNet's odd channel counts) stay replicated —
they are a rounding error of the state bytes.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves below this many elements are replicated: a (C,) BatchNorm vector
# costs nothing to replicate, and sharding it would just add latency-bound
# tiny collectives. 8192 f32 elements = 32 KiB.
MIN_SHARD_ELEMS = 8192


def fsdp_spec(shape: tuple, n_shards: int, axis_name: str = "data",
              min_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec sharding the largest ``n_shards``-divisible dim."""
    shape = tuple(int(d) for d in shape)
    if int(np.prod(shape, dtype=np.int64)) < min_elems:
        return P()
    best_size, best_dim = -1, -1
    for i, d in enumerate(shape):
        # >= prefers the later dim on ties (out-features over kernel taps)
        if d % n_shards == 0 and d > 0 and d >= best_size:
            best_size, best_dim = d, i
    if best_dim < 0:
        return P()
    spec: list = [None] * len(shape)
    spec[best_dim] = axis_name
    return P(*spec)


def _guard_model_axis(mesh: Mesh, axis_name: str,
                      model_name: str | None) -> None:
    """Weight sharding over a non-'data' axis of a >=2D mesh is the hybrid
    layout where XLA 0.9.0 silently mis-scales grouped-conv kernel gradients
    (see ``GROUPED_CONV_FAMILIES``) — it requires ``model_name`` so the
    family guard can run. 1D meshes and the 'data' axis are always safe."""
    if axis_name == "data" or len(mesh.axis_names) < 2:
        return
    if mesh.shape[axis_name] == 1:
        return   # a 1-wide axis shards nothing; the ×axis_size bug is ×1
    if model_name is None:
        raise ValueError(
            f"weight sharding over mesh axis {axis_name!r} of a "
            f"{len(mesh.axis_names)}D mesh requires model_name= so the "
            "grouped-conv gradient guard can run (see "
            "check_model_axis_safety)")
    check_model_axis_safety(model_name, mesh, axis_name)


def fsdp_sharding(mesh: Mesh, tree: Any, axis_name: str = "data",
                  min_elems: int = MIN_SHARD_ELEMS,
                  model_name: str | None = None) -> Any:
    """Pytree of NamedShardings mirroring ``tree`` (shapes may come from
    concrete arrays or ShapeDtypeStructs — only ``.shape`` is read)."""
    _guard_model_axis(mesh, axis_name, model_name)
    n = mesh.shape[axis_name]

    def leaf(x):
        return NamedSharding(
            mesh, fsdp_spec(getattr(x, "shape", ()), n, axis_name, min_elems))

    return jax.tree.map(leaf, tree)


def put_fsdp(mesh: Mesh, tree: Any, axis_name: str = "data",
             min_elems: int = MIN_SHARD_ELEMS,
             model_name: str | None = None) -> Any:
    """Place a host pytree onto the mesh FSDP-sharded.

    Single-process meshes use a plain sharded ``device_put``. Multi-process
    meshes (``jax.distributed``) build each global array from this process's
    addressable shards via ``make_array_from_callback`` — every process must
    hold the identical full value (e.g. a same-seed init), mirroring the
    ``put_replicated`` contract.

    Sharding over a non-'data' axis of a >=2D mesh (the hybrid layout)
    requires ``model_name`` — grouped-conv families are refused there
    (see ``check_model_axis_safety``).
    """
    shardings = fsdp_sharding(mesh, tree, axis_name, min_elems, model_name)

    def put(x, s):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_callback(x.shape, s,
                                                lambda idx: x[idx])
        return jax.device_put(x, s)

    return jax.tree.map(put, tree, shardings)


# Families whose backbones contain grouped convolutions
# (feature_group_count > 1): depthwise MBConv stages (efficientnet, rexnet)
# and cardinality-grouped bottlenecks (resnext). Under XLA 0.9.0's GSPMD
# partitioner, the kernel GRADIENT of a grouped conv on a >=2D mesh is
# silently multiplied by the size of every mesh axis over which the conv's
# input activations are replicated (measured: exactly 2x on a (data=4,
# model=2) mesh, 4x on (data=2, model=4); correct when the activation
# channel dim is actually sharded on that axis, and always correct on a 1D
# mesh — see tests/test_fsdp.py::TestGroupedConv2DMeshCanary). Whether a
# given layer's activations end up replicated is decided by sharding
# propagation, not by us — so hybrid (model-axis) sharding of these
# families is a silent-wrong-gradients trap, not a perf question.
GROUPED_CONV_FAMILIES = ("efficientnet", "rexnet", "resnext")


def check_model_axis_safety(model_name: str, mesh: Mesh,
                            axis_name: str = "model") -> None:
    """Refuse hybrid (model-axis) sharding for grouped-conv model families.

    Only relevant for >=2D meshes with a weight-sharding axis; the 1D DP and
    1D FSDP paths (the Trainer's only meshes) compute grouped-conv gradients
    correctly and are not affected. See ``GROUPED_CONV_FAMILIES`` above for
    the XLA bug this guards against.
    """
    if axis_name not in mesh.axis_names or len(mesh.axis_names) < 2:
        return
    if mesh.shape[axis_name] == 1:
        return   # a 1-wide axis shards nothing; the ×axis_size bug is ×1
    fam = model_name.lower()
    if any(f in fam for f in GROUPED_CONV_FAMILIES):
        raise NotImplementedError(
            f"model-axis (hybrid) sharding of '{model_name}' is disabled: "
            "XLA 0.9.0 GSPMD mis-scales grouped-conv kernel gradients on "
            ">=2D meshes (see parallel/fsdp.py GROUPED_CONV_FAMILIES). Use "
            "a 1D mesh (param_sharding='fsdp') or a dense backbone (swin, "
            "resnet50).")


def constrain_fsdp(mesh: Mesh, tree: Any, axis_name: str = "data",
                   min_elems: int = MIN_SHARD_ELEMS,
                   model_name: str | None = None) -> Any:
    """``with_sharding_constraint`` the tree to its FSDP layout inside jit.

    Applied to the updated train state before it leaves the step so the
    optimizer update provably stays sharded (GSPMD usually propagates the
    input sharding to the elementwise update anyway; the constraint makes the
    memory property a guarantee instead of a compiler mood). Non-'data'
    axes require ``model_name`` (see ``put_fsdp``).
    """
    _guard_model_axis(mesh, axis_name, model_name)
    n = mesh.shape[axis_name]

    def leaf(x):
        sh = NamedSharding(mesh, fsdp_spec(x.shape, n, axis_name, min_elems))
        return jax.lax.with_sharding_constraint(x, sh)

    return jax.tree.map(leaf, tree)
