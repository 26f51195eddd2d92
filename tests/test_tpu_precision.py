"""On-TPU matmul-precision agreement test (VERDICT r4 task 2's "Done").

The suite's conftest forces every in-process test onto CPU, where JAX f32
IS true f32 — which is exactly why the default-precision bf16-truncation
gap on TPU went untested through round 4. This file drives the REAL chip
in a subprocess (the axon env is kept, unlike every other subprocess test)
and asserts the stated bounds:

- |default − highest| scores ≤ 1e-3 (bf16 input rounding is ~2.8e-4 on
  unit-cosine scores; PERF.md 'Matmul precision'),
- fused-vs-dense agreement at precision='highest' (the lax.cond fallback
  contract holds at the non-default setting): top-1 = 1.0, scores ≤ 1e-6,
- Gaussian-data default-vs-highest top-1 ≥ 0.98 (near-ties only), while
  near-tie-clustered data (margins below the truncation noise) shows real
  divergence — the regime where reference parity needs 'highest'.

Skips (not fails) when no chip is reachable or another process holds the
chip grant (subprocess timeout): the numeric assertions only make sense
on real TPU hardware.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_SCRIPT = r"""
import json
import numpy as np
import jax
import jax.numpy as jnp

if jax.devices()[0].platform == "cpu":
    print(json.dumps({"skip": "no TPU visible"}))
    raise SystemExit(0)

import sys
sys.path.insert(0, {repo!r})
from imageretrievalresearch_tpu.ops.retrieval import cosine_topk

G, D, Q, K = 8192, 512, 256, 32

def unit(x):
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)

def near_tie(key, n):
    kc, kn, ka = jax.random.split(key, 3)
    centers = unit(jax.random.normal(kc, (32, D)))
    assign = jax.random.randint(ka, (n,), 0, 32)
    return unit(centers[assign]
                + 1e-3 * jax.random.normal(kn, (n, D)) / np.sqrt(D))

out = {}
for dist in ("gaussian", "near_tie"):
    if dist == "gaussian":
        g = jax.random.normal(jax.random.key(0), (G, D))
        q = jax.random.normal(jax.random.key(1), (Q, D))
    else:
        g = near_tie(jax.random.key(0), G)
        q = near_tie(jax.random.key(1), Q)
    vd, idd = cosine_topk(q, g, K, precision="default")
    vh, idh = cosine_topk(q, g, K, precision="highest")
    vdn, vhn = np.asarray(vd), np.asarray(vh)
    out[dist] = {
        "top1": float((np.asarray(idd)[:, 0] == np.asarray(idh)[:, 0])
                      .mean()),
        "max_dscore": float(np.abs(vdn - vhn).max()),
    }
    if dist == "gaussian":
        vde, ide = cosine_topk(q, g, K, method="dense",
                               precision="highest")
        out["fused_vs_dense_highest"] = {
            "top1": float((np.asarray(idh)[:, 0] == np.asarray(ide)[:, 0])
                          .mean()),
            "max_dscore": float(np.abs(np.asarray(vh)
                                       - np.asarray(vde)).max()),
        }
print(json.dumps(out))
"""


def test_default_vs_highest_agreement_on_chip(tmp_path):
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        pytest.skip("no remote-TPU transport configured")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "agree.py"
    script.write_text(_SCRIPT.replace("{repo!r}", repr(repo)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # the chip, not the test-suite CPU
    try:
        proc = subprocess.run([sys.executable, "-u", str(script)],
                              capture_output=True, text=True, env=env,
                              cwd=repo, timeout=420)
    except subprocess.TimeoutExpired:
        pytest.skip("chip busy or unreachable (subprocess timeout — "
                    "another process may hold the chip grant)")
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    if "skip" in out:
        pytest.skip(out["skip"])

    # stated bound: default's scores differ from true-f32 by at most the
    # bf16 input-rounding noise (~2.8e-4 measured; 1e-3 with headroom)
    assert out["gaussian"]["max_dscore"] < 1e-3
    assert out["near_tie"]["max_dscore"] < 1e-3
    # random data: only near-ties reorder
    assert out["gaussian"]["top1"] >= 0.98
    # the fallback contract holds at 'highest'
    fd = out["fused_vs_dense_highest"]
    assert fd["top1"] == 1.0 and fd["max_dscore"] < 1e-6
    # the documented footgun is real: sub-noise margins decorrelate the
    # default ranking (if this ever rises to ~1, the MXU default changed
    # and the PERF.md guidance should be revisited)
    assert out["near_tie"]["top1"] < 0.9
