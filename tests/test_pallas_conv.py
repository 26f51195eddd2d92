"""Pallas depthwise conv: parity vs the XLA grouped conv (interpret mode).

The kernel claims exact torch ``Conv2d(..., padding=K//2, groups=C)``
semantics (the depthwise stages of EfficientNet/RexNet — reference
train/train_efficientnet.py:226-244 backbone zoo), so every case is pinned
against ``lax.conv_general_dilated`` with ``feature_group_count=C``, forward
and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imageretrievalresearch_tpu.ops.pallas_conv import (
    _dw_op,
    _xla_dw,
    depthwise_conv2d,
    use_pallas_depthwise,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


CASES = [
    # (N, H, W, C, K, stride) — chosen to cover: C < lane width, C > 128
    # with a partial lane block, odd spatial, stride 2 with odd/even H,
    # batch blocks > 1.
    (2, 16, 16, 8, 3, 1),
    (4, 14, 14, 40, 3, 2),
    (1, 15, 15, 8, 5, 1),
    (2, 13, 9, 144, 5, 2),
    (8, 7, 7, 160, 3, 1),
    (2, 9, 9, 8, 7, 1),
]


@pytest.mark.parametrize("n,h,w,c,k,s", CASES)
def test_forward_matches_xla(n, h, w, c, k, s):
    x = _rand(0, (n, h, w, c))
    wt = _rand(1, (k, k, 1, c))
    got = _dw_op(x, wt, s, True)  # interpret=True exercises the kernel
    want = _xla_dw(x, wt, s)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,h,w,c,k,s", CASES)
def test_grads_match_xla(n, h, w, c, k, s):
    x = _rand(2, (n, h, w, c))
    wt = _rand(3, (k, k, 1, c))
    # non-uniform cotangent via a weighted sum
    cw = _rand(4, _xla_dw(x, wt, s).shape)

    def loss_pallas(x_, w_):
        return jnp.sum(_dw_op(x_, w_, s, True) * cw)

    def loss_xla(x_, w_):
        return jnp.sum(_xla_dw(x_, w_, s) * cw)

    gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(x, wt)
    ex, ew = jax.grad(loss_xla, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ew),
                               rtol=1e-4, atol=1e-4)


def test_bf16_forward_close():
    x = _rand(5, (2, 14, 14, 40), jnp.bfloat16)
    wt = _rand(6, (3, 3, 1, 40), jnp.bfloat16)
    got = np.asarray(_dw_op(x, wt, 1, True), np.float32)
    want = np.asarray(_xla_dw(x, wt, 1), np.float32)
    # kernel accumulates in f32; XLA may keep bf16 — budget a bf16 ulp
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_cpu_dispatch_falls_back_to_xla():
    assert not use_pallas_depthwise()  # CPU backend + default-off gate
    x = _rand(7, (2, 8, 8, 16))
    wt = _rand(8, (3, 3, 1, 16))
    np.testing.assert_array_equal(
        np.asarray(depthwise_conv2d(x, wt, stride=1)),
        np.asarray(_xla_dw(x, wt, 1)))


def test_rejects_non_depthwise_kernel():
    x = _rand(9, (1, 8, 8, 16))
    with pytest.raises(AssertionError):
        depthwise_conv2d(x, _rand(10, (3, 3, 16, 16)), stride=1)


def test_tile_plan_splits_the_big_b3a_layer():
    """The (256,112,112,40) K=3 layer OOMed VMEM unplanned (25.6 MB vs the
    16 MB scoped limit); the planner must split its output rows."""
    from imageretrievalresearch_tpu.ops import pallas_conv as pc
    plan = pc._tile_plan(256, 112, halo=2, w_in=114, wo=112, itemsize=2,
                         n_in=1)
    assert plan is not None
    T, nb = plan
    assert T >= 2
    assert pc._vmem_bytes(nb, 112 // T + 2, 114, 112 // T, 112,
                          2) <= pc._VMEM_BUDGET


@pytest.mark.parametrize("s", [1, 2])
def test_tiled_path_matches_xla(monkeypatch, s):
    """Force T>1 tiling on a small shape and check fwd+grad parity."""
    from imageretrievalresearch_tpu.ops import pallas_conv as pc
    monkeypatch.setattr(pc, "_VMEM_BUDGET", 300 * 1024)
    n, h, w, c, k = 2, 16, 16, 8, 3
    ho = pc._out_len(h, k, s)
    halo = (k - 1) if s == 1 else k // 2
    w_in = (w + 2) if s == 1 else (ho + k // 2)
    assert pc._tile_plan(n, ho, halo=halo, w_in=w_in, wo=ho, itemsize=4,
                         n_in=1 if s == 1 else 4)[0] > 1
    x = _rand(11, (n, h, w, c))
    wt = _rand(12, (k, k, 1, c))
    np.testing.assert_allclose(np.asarray(_dw_op(x, wt, s, True)),
                               np.asarray(_xla_dw(x, wt, s)),
                               rtol=1e-5, atol=1e-5)
    cw = _rand(13, _xla_dw(x, wt, s).shape)
    gx, gw = jax.grad(lambda a, b: jnp.sum(_dw_op(a, b, s, True) * cw),
                      argnums=(0, 1))(x, wt)
    ex, ew = jax.grad(lambda a, b: jnp.sum(_xla_dw(a, b, s) * cw),
                      argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ew),
                               rtol=1e-4, atol=1e-4)


def test_conv_bn_act_param_tree_unchanged():
    """The Pallas-routed module must keep the nn.Conv param tree so converted
    checkpoints load identically."""
    from imageretrievalresearch_tpu.models.layers import ConvBnAct
    m = ConvBnAct(40, kernel_size=5, stride=2, groups=40)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 14, 14, 40)))
    assert v["params"]["conv"]["kernel"].shape == (5, 5, 1, 40)
