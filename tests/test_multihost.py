"""Multi-process data-parallel training (SURVEY.md §2: DDP maps to mesh +
pjit with host data loading sharded per-process).

Two jax.distributed processes × 4 virtual CPU devices each must produce
the same training loss as one process × 8 devices: the loader's
per-process batch slices reassemble into the identical global batch
(per-(epoch, idx) sample RNG), and XLA's SPMD reductions (BN batch stats,
loss mean, gradient all-reduce) are global either way.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree

pytestmark = pytest.mark.slow

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port, tree = (int(sys.argv[1]), int(sys.argv[2]),
                          sys.argv[3], sys.argv[4])
ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else None
if nproc > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.data import SketchyImageDataset, TripletLoader
from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.train import Trainer

cfg = TrainConfig(model_name="efficientnet_b0", batch_size=8, image_size=32,
                  compute_dtype="float32", max_epochs=1, learning_rate=1e-3,
                  log_every_n_steps=1000, checkpoint_dir=ckpt_dir)
ds = SketchyImageDataset(data_dir=tree)
dl = TripletLoader(ds, cfg.batch_size, num_workers=2, seed=0,
                   process_index=jax.process_index(),
                   process_count=jax.process_count())
# same dataset as a val loader: each process yields its LOCAL slice of
# every global batch, so the eval path must shard local rows over local
# devices (a gate on the GLOBAL device count would skip every batch here)
dv = TripletLoader(ds, cfg.batch_size, shuffle=False, num_workers=2, seed=1,
                   process_index=jax.process_index(),
                   process_count=jax.process_count())
bb = create_model(cfg.model_name, num_classes=ds.get_cat_length(),
                  depth_mult=0.1, width_mult=0.5)
trainer = Trainer(cfg, bb, dl, val_loader=dv)
state, history = trainer.fit(max_epochs=1)
last = history['epochs'][-1]
print(f"FINAL_LOSS {last['train_loss']:.6f}", flush=True)
print(f"VAL_COS {last['cos_sims']:.6f} {last['val_loss']:.6f}", flush=True)
if ckpt_dir:
    # the orbax save barrier requires EVERY process to participate
    # (train/trainer.py); a restore must agree across processes too
    best = trainer.ckpt.best_step()
    restored = trainer.ckpt.restore(jax.device_get(state), step=best)
    probe = jax.tree.leaves(restored.params)[0]
    import numpy as np
    print(f"CKPT {best} {float(np.asarray(probe).ravel()[0]):.8f}",
          flush=True)
"""


def _spawn(pid, nproc, ndev, port, tree, repo, ckpt_dir=None):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        # never start the remote-TPU client in CPU workers
                        # (its startup registration can block on the chip
                        # grant while the pytest parent holds it)
                        "PALLAS_AXON_POOL_IPS", "_AXON_REGISTERED")}
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    env["PYTHONPATH"] = repo
    argv = [sys.executable, "-c", _WORKER, str(pid), str(nproc), str(port),
            tree]
    if ckpt_dir:
        argv.append(ckpt_dir)
    return subprocess.Popen(
        argv, env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)


def _final_loss(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("FINAL_LOSS"):
            return float(line.split()[1])
    raise AssertionError(f"no FINAL_LOSS in output:\n{out}")


def _ckpt_line(out: str) -> str:
    for line in out.splitlines():
        if line.startswith("CKPT"):
            return line
    raise AssertionError(f"no CKPT in output:\n{out}")


def _val_metrics(out: str) -> tuple[float, float]:
    """(cos_sims, val_loss) — absent entirely if the eval path dropped
    every batch (e.g. a local-vs-global device-count gate bug)."""
    for line in out.splitlines():
        if line.startswith("VAL_COS"):
            parts = line.split()
            return float(parts[1]), float(parts[2])
    raise AssertionError(f"no VAL_COS in output:\n{out}")


class TestMultiProcessDP:
    def test_two_processes_match_single_process(self, tmp_path):
        tree = make_sketchy_tree(str(tmp_path / "sk"), n_cats=3, n_prods=1,
                                 n_photos=8, n_sketches=4, size=32)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        # 2 processes x 4 virtual devices, coordinated; all processes
        # participate in the SAME orbax checkpoint directory (the save
        # barrier deadlocks if any process skips — train/trainer.py)
        ckpt_dir = str(tmp_path / "ckpt_multi")
        workers = [_spawn(pid, 2, 4, port, tree, repo, ckpt_dir)
                   for pid in range(2)]
        outs = [w.communicate(timeout=540) for w in workers]
        for w, (so, se) in zip(workers, outs):
            assert w.returncode == 0, (so, se)
        multi = _final_loss(outs[0][0])
        multi_val = _val_metrics(outs[0][0])
        assert multi == pytest.approx(_final_loss(outs[1][0]), rel=1e-6)
        # both processes restored the same best checkpoint
        cks = [_ckpt_line(o[0]) for o in outs]
        assert cks[0] == cks[1], cks

        # 1 process x 8 virtual devices, same seeds
        single = _spawn(0, 1, 8, port, tree, repo)
        so, se = single.communicate(timeout=540)
        assert single.returncode == 0, (so, se)
        assert multi == pytest.approx(_final_loss(so), rel=1e-4)
        # validation must run (not be gate-skipped) and match the
        # single-process topology
        single_val = _val_metrics(so)
        assert multi_val[0] == pytest.approx(single_val[0], rel=1e-4)
        assert multi_val[1] == pytest.approx(single_val[1], rel=1e-4)
