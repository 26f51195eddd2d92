"""The Trainer: jit-compiled data-parallel training over a device mesh.

Replaces the reference's ``pl.Trainer(precision=16, strategy='ddp',
devices=3, callbacks=[ModelCheckpoint, EarlyStopping, LearningRateMonitor])``
(train/train.py:428-454) with:

- one ``Mesh('data')``; batches sharded on the leading dim, state replicated
  — XLA inserts the gradient all-reduce (the DDP equivalent),
- bf16 compute (the fp16-AMP equivalent on TPU), f32 params/optimizer,
- fused on-device preprocessing per batch (resize/AutoAugment/normalize),
- orbax best-k checkpointing + early stopping on the monitored metric
  (``cos_sims``, mode max, patience 10 — train/train.py:448-451),
- metric logging with the reference's exact key names.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.models.backbone import Backbone
from imageretrievalresearch_tpu.ops.preprocess import (
    TransformSpec,
    build_image_transform,
    build_triplet_transform,
)
from imageretrievalresearch_tpu.parallel.fsdp import (
    constrain_fsdp,
    put_fsdp,
)
from imageretrievalresearch_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    put_replicated,
    replicate,
    shard_batch,
)
from imageretrievalresearch_tpu.train.steps import (
    build_classifier_eval_step,
    build_classifier_train_step,
    build_eval_step,
    build_train_step,
)
from imageretrievalresearch_tpu.train.train_state import (
    EmbedTrainState,
    make_optimizer,
    multistep_lr,
)
from imageretrievalresearch_tpu.utils.checkpoint import CheckpointManager
from imageretrievalresearch_tpu.utils.logging import MetricLogger


class EarlyStopping:
    """Monitor-based early stop (reference train/train.py:451, patience 10)."""

    def __init__(self, monitor: str = "cos_sims", mode: str = "max",
                 patience: int = 10):
        self.monitor, self.mode, self.patience = monitor, mode, patience
        self.best: float | None = None
        self.bad_epochs = 0

    def update(self, metrics: dict) -> bool:
        """Returns True when training should stop."""
        val = float(metrics[self.monitor])
        better = (self.best is None
                  or (val > self.best if self.mode == "max" else val < self.best))
        if better:
            self.best, self.bad_epochs = val, 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs >= self.patience


class Trainer:
    def __init__(self, cfg: TrainConfig, backbone: Backbone,
                 train_loader, val_loader=None,
                 logger: MetricLogger | None = None,
                 mesh=None, transform=None, eval_transform=None,
                 metric_transforms: dict | None = None):
        """``transform``/``eval_transform``: custom fused batch transforms
        (raw loader batch, PRNG key) -> float batch. A custom ``transform``
        is reused for evaluation unless ``eval_transform`` is given — pass
        a deterministic one when the train transform is stochastic
        (evaluation invokes it with key=None)."""
        self.cfg = cfg
        # post-hoc transforms applied to each per-batch validation metric
        # before epoch-averaging/logging — the reference's find_lr flow logs
        # cos_sims through its booster (train/find_lr.py:87-95,337) while
        # the other four recipes log it raw (train/train.py:370)
        self.metric_transforms = dict(metric_transforms or {})
        self.backbone = backbone
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = mesh or make_mesh(cfg.num_devices)
        if cfg.param_sharding not in ("replicated", "fsdp"):
            # a real raise, not assert: under `python -O` an assert would
            # vanish and a typo'd value would silently train replicated
            raise ValueError(
                f"param_sharding must be 'replicated' or 'fsdp', "
                f"got {cfg.param_sharding!r}")
        self._fsdp = cfg.param_sharding == "fsdp"
        if self._fsdp and jax.process_count() > 1:
            # checkpointing device_gets the state, which requires fully
            # addressable arrays; multi-process FSDP needs a distributed
            # save path this framework doesn't carry yet
            raise NotImplementedError(
                "param_sharding='fsdp' is single-process (single-controller) "
                "only; multi-process runs use replicated state")
        # multi-process runs: only process 0 writes logs/checkpoints
        self._is_main = jax.process_index() == 0
        self.logger = logger or MetricLogger(
            cfg.checkpoint_dir if self._is_main else None,
            log_every_n_steps=cfg.log_every_n_steps)
        # without a val loader the monitored validation metric (cos_sims by
        # default) never exists — fall back to the train loss so training
        # still persists weights instead of silently discarding them
        monitor, monitor_mode = cfg.monitor, cfg.monitor_mode
        if val_loader is None and not monitor.startswith("train"):
            monitor, monitor_mode = "train_loss", "min"
        elif (cfg.effective_task == "classification"
              and monitor == "cos_sims"):
            # the config default is the triplet metric; the classifier eval
            # emits val_loss/val_top1/val_top3 only — an absent monitor
            # would silently persist no checkpoints and never early-stop.
            # The reference's T5 monitors val_top1, mode max
            # (train_vit_crossentropy.py:335-336).
            monitor, monitor_mode = "val_top1", "max"
            print("[trainer] monitor cos_sims is a triplet metric; "
                  "classification monitors val_top1 (reference T5)")
        # the single monitor/mode pair every consumer (checkpoint manager,
        # early stopping, the fit() save gates) must agree on
        self._monitor, self._monitor_mode = monitor, monitor_mode
        self._ckpt_monitor = monitor
        self.ckpt = (CheckpointManager(cfg.checkpoint_dir,
                                       monitor=monitor,
                                       mode=monitor_mode,
                                       save_top_k=cfg.save_top_k)
                     if cfg.checkpoint_dir else None)
        if cfg.checkpoint_dir and self._is_main:
            # hyperparameters alongside checkpoints (the reference's
            # Lightning save_hyperparameters yaml, train/train.py:133);
            # main-process-only like every other writer here — N processes
            # racing 'w' on a shared checkpoint filesystem can interleave
            import dataclasses
            import os

            import yaml
            os.makedirs(cfg.checkpoint_dir, exist_ok=True)
            with open(os.path.join(cfg.checkpoint_dir, "hparams.yaml"),
                      "w") as f:
                yaml.safe_dump(
                    {k: (list(v) if isinstance(v, tuple) else v)
                     for k, v in dataclasses.asdict(cfg).items()}, f)

        steps_per_epoch = max(1, len(train_loader))
        self.schedule = multistep_lr(cfg.learning_rate, cfg.milestones,
                                     cfg.lr_gamma, steps_per_epoch)
        self.tx = make_optimizer(cfg.optimizer_name, self.schedule,
                                 cfg.weight_decay)

        # single-image CE classification (T5 on an ImageFolder tree) swaps
        # both the transform shape and the step builders; everything else
        # (mesh, checkpointing, logging, early stop) is shared
        classification = cfg.effective_task == "classification"
        if eval_transform is None:
            eval_transform = transform
        if transform is None:
            spec = (TransformSpec.train_autoaugment(cfg.image_size)
                    if cfg.autoaugment
                    else TransformSpec.train_plain(cfg.image_size))
            spec = TransformSpec(**{**spec.__dict__,
                                    "dtype": cfg.compute_dtype})
            # evaluation is deterministic: same pipeline minus the random
            # AutoAugment stage (the reference reuses its train Compose for
            # val, which randomly augments val images — we pin eval to the
            # deterministic intent)
            espec = TransformSpec(**{**spec.__dict__, "autoaugment": False})
            if classification:
                transform = build_image_transform(spec)
                if eval_transform is None:
                    eval_transform = build_image_transform(espec)
            else:
                transform = build_triplet_transform(spec, spec, spec)
                if eval_transform is None:
                    eval_transform = build_triplet_transform(espec, espec,
                                                             espec)
        self.transform = transform
        self.eval_transform = eval_transform

        # fuse the batch transform into the train/eval dispatch: one jitted
        # call per step instead of two halves the per-step host dispatch
        # work, which competes with the loader thread for CPU on small
        # hosts (PERF.md round-2 training notes)
        if classification:
            base_train = build_classifier_train_step(backbone, cfg,
                                                     self.schedule)
            base_eval = build_classifier_eval_step(backbone, cfg)
        else:
            base_train = build_train_step(backbone, cfg, self.schedule)
            base_eval = build_eval_step(backbone, cfg)
        tf, etf = self.transform, self.eval_transform

        fsdp, mesh_ = self._fsdp, self.mesh

        def fused_train(state, raw_batch, tkey, skey):
            new_state, metrics = base_train(state, tf(raw_batch, tkey), skey)
            if fsdp:
                # pin the updated state to its FSDP layout so the sharded
                # memory footprint survives every step by construction
                new_state = constrain_fsdp(mesh_, new_state)
            return new_state, metrics

        def fused_eval(state, raw_batch):
            return base_eval(state, etf(raw_batch, None))

        self._train_step = jax.jit(fused_train, donate_argnums=(0,))
        self._eval_step = jax.jit(fused_eval)

    # --- state ---

    def init_state(self, rng: jax.Array | None = None,
                   sample_shape: tuple | None = None,
                   tx=None) -> EmbedTrainState:
        """``tx`` overrides the configured optimizer (the lr_find sweep
        builds states whose schedule is the sweep grid)."""
        rng = rng if rng is not None else jax.random.key(self.cfg.seed)
        shape = sample_shape or (1, self.cfg.image_size,
                                 self.cfg.image_size, 3)
        # initialize on the host CPU, then replicate: pushing the init
        # program through a remote-TPU transport is several minutes of
        # needless compile for a one-shot computation
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            sample = jnp.zeros(shape, dtype=self.cfg.compute_dtype)
            variables = self.backbone.init(rng, sample)
            state = EmbedTrainState.from_backbone(self.backbone, variables,
                                                  tx if tx is not None
                                                  else self.tx)
        # multi-process safe: every process runs the identical seeded init
        return self._put_state(state)

    def _put_state(self, state: EmbedTrainState) -> EmbedTrainState:
        """Place a host-resident state onto the mesh in the configured
        layout (replicated DDP-style, or FSDP-sharded params+optimizer)."""
        if self._fsdp:
            return put_fsdp(self.mesh, state)
        return put_replicated(self.mesh, state)

    # --- loops ---

    def _prepare(self, batch: dict) -> dict:
        """Shard the raw uint8 host batch onto the mesh; the float
        transform happens inside the fused step dispatch."""
        return shard_batch(self.mesh, batch)

    def train_epoch(self, state: EmbedTrainState, epoch: int
                    ) -> tuple[EmbedTrainState, dict]:
        self.train_loader.set_epoch(epoch)
        key = jax.random.key(self.cfg.seed + 1000 + epoch)
        agg: dict[str, list] = {}
        profiling = False
        for i, batch in enumerate(self.train_loader):
            if self.cfg.profile_dir and epoch == 0 and i == 1:
                # trace steps 1-3 of the first epoch (step 0 is compile)
                jax.profiler.start_trace(self.cfg.profile_dir)
                profiling = True
            key, bkey, skey = jax.random.split(key, 3)
            state, metrics = self._train_step(state, self._prepare(batch),
                                              bkey, skey)
            if profiling and i >= 3:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
            # keep metrics on device: fetching per step would synchronize
            # the pipeline (and costs ~30ms/scalar over remote transports);
            # only steps on the logging cadence are materialized now
            if (i + 1) % self.cfg.log_every_n_steps == 0:
                if self._is_main:
                    self.logger.log(metrics, int(state.step), force=True)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
        if profiling:
            jax.profiler.stop_trace()
        agg = jax.device_get(agg)
        return state, {k: float(np.mean(v)) for k, v in agg.items()}

    def _eval_batches(self, state: EmbedTrainState, loader
                      ) -> tuple[dict[str, list[float]], list[int]]:
        """Per-batch eval metrics + batch sizes, fetched once at the end
        (device arrays accumulate on device; one transfer instead of one
        per step). The sizes weight the epoch mean: Lightning's epoch
        aggregation is batch-size-weighted, so an unweighted mean would
        over-weight a ``drop_last=False`` partial final batch.

        A final partial batch (``drop_last=False`` test loaders) whose size
        doesn't divide the mesh runs UNSHARDED on the default device — exact
        metrics over the real items (padding would inject duplicate gallery
        candidates into the in-batch top-k). Costs one extra compile per
        distinct remainder shape, i.e. at most one per loader.
        """
        n_dev = int(np.prod(list(self.mesh.shape.values())))
        # each process's loader yields only its LOCAL slice of the global
        # batch (shard_batch assembles the global array across processes),
        # so shardability is local rows vs THIS process's device count —
        # gating on the global n_dev would skip every multi-process batch
        # whose local slice is smaller than the full mesh. This decision
        # gates entry into a COLLECTIVE program, so it must be identical on
        # every process: TripletLoader guarantees equal local slices for
        # every batch (partial batches are trimmed to a process_count
        # multiple, identically everywhere).
        n_local_dev = max(n_dev // max(jax.process_count(), 1), 1)
        agg: dict[str, list] = {}
        sizes: list[int] = []
        for batch in loader:
            n = np.asarray(jax.tree.leaves(batch)[0]).shape[0]
            if n % n_local_dev == 0:
                prepped = self._prepare(batch)
            elif jax.process_count() == 1:
                prepped = jax.tree.map(jnp.asarray, batch)
            else:
                # multi-process: no global remainder protocol — say so
                # instead of silently reporting metrics over fewer items
                # than a single-process run would
                if self._is_main:
                    print(f"[trainer] WARNING: multi-process eval skipped a "
                          f"final partial batch of {n} local items (size "
                          f"does not divide the {n_local_dev} local devices "
                          f"of the {n_dev}-device mesh); metrics cover the "
                          f"remaining batches only")
                continue
            metrics = self._eval_step(state, prepped)
            sizes.append(int(n))
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)   # stay on device
        agg = jax.device_get(agg)
        return {k: [float(x) for x in v] for k, v in agg.items()}, sizes

    def eval_epoch(self, state: EmbedTrainState, loader=None,
                   transforms: dict | None = None) -> dict:
        """Batch-size-weighted mean over per-batch eval metrics (item-level
        semantics, matching Lightning's weighted epoch aggregation);
        ``transforms`` (e.g. the find_lr booster) are applied to each
        PER-BATCH value before the mean — the reference boosts every logged
        validation-step value and lets Lightning epoch-average the boosted
        series (train/find_lr.py:87-95,337), which differs from boosting
        the epoch mean because the booster is piecewise."""
        agg, sizes = self._eval_batches(state, loader or self.val_loader)
        out = {}
        for k, v in agg.items():
            f = (transforms or {}).get(k)
            vals = [float(f(x)) for x in v] if f is not None else v
            out[k] = float(np.average(vals, weights=sizes))
        return out

    def _logged_monitor_best(self) -> float | None:
        """Best monitored value replayed from the run's metrics.jsonl
        (None when no log exists yet) — seeds EarlyStopping on resume."""
        import os
        if not self.cfg.checkpoint_dir:
            return None
        path = os.path.join(self.cfg.checkpoint_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return None
        import json
        vals = []
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue          # torn tail line from a preemption
                if self._monitor in rec:
                    vals.append(float(rec[self._monitor]))
        if not vals:
            return None
        return max(vals) if self._monitor_mode == "max" else min(vals)

    def fit(self, state: EmbedTrainState | None = None,
            max_epochs: int | None = None, resume: bool = False
            ) -> tuple[EmbedTrainState, dict]:
        """Train. ``resume=True`` restores the latest orbax checkpoint and
        continues from its step (the restartable loop the reference lacks —
        its only resume is a hardcoded pretrained path, train/train.py:461-466)."""
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        start_epoch = 0
        if resume and self.ckpt and self.ckpt.latest_step() is not None:
            restored = self.ckpt.restore(jax.device_get(state),
                                         step=self.ckpt.latest_step())
            state = self._put_state(restored)
            steps_per_epoch = max(1, len(self.train_loader))
            start_epoch = int(state.step) // steps_per_epoch
            print(f"[trainer] resumed from step {int(state.step)} "
                  f"(epoch {start_epoch})")
        stopper = EarlyStopping(self._monitor, self._monitor_mode,
                                cfg.early_stop_patience)
        if start_epoch:
            # a resumed run must not forget its pre-preemption best: a
            # worse post-resume value would otherwise look like a "new
            # best", restarting the patience window and training past
            # where the uninterrupted run would have stopped. The best is
            # replayed from metrics.jsonl (written by process 0 into the
            # shared checkpoint dir; every process reads the same file so
            # the collective stop decision stays identical).
            stopper.best = self._logged_monitor_best()
        monitor_warned = False
        history: dict[str, list] = {"epochs": []}
        epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        for epoch in range(start_epoch, epochs):
            state, train_metrics = self.train_epoch(state, epoch)
            epoch_metrics = dict(train_metrics)
            if self.val_loader is not None:
                val_metrics = self.eval_epoch(
                    state, transforms=self.metric_transforms)
                if not val_metrics:
                    print("[trainer] WARNING: validation loader yielded no "
                          "batches (val split smaller than batch size with "
                          "drop_last?) — no val metrics, no checkpoints "
                          "this epoch")
                epoch_metrics.update(val_metrics)
                if self._is_main:
                    self.logger.log(val_metrics, int(state.step), force=True)
                if (val_metrics and not monitor_warned
                        and self._monitor not in epoch_metrics):
                    monitor_warned = True
                    print(f"[trainer] WARNING: monitor "
                          f"{self._monitor!r} is not among the validation "
                          f"metrics {sorted(val_metrics)} — no checkpoints "
                          "will be saved and early stopping is disabled")
                # orbax coordinates multihost saves itself — every process
                # must participate or the save barrier deadlocks
                if self.ckpt and self._monitor in epoch_metrics:
                    self.ckpt.save(int(state.step), jax.device_get(state),
                                   epoch_metrics)
                if (self._monitor in epoch_metrics
                        and stopper.update(epoch_metrics)):
                    history["epochs"].append(epoch_metrics)
                    history["stopped_early"] = epoch
                    break
            elif self.ckpt and self._ckpt_monitor in epoch_metrics:
                # no validation loader: checkpoint per epoch on the train
                # metric so fit() never ends with zero saved weights
                self.ckpt.save(int(state.step), jax.device_get(state),
                               epoch_metrics)
            history["epochs"].append(epoch_metrics)
        if self.ckpt:
            self.ckpt.wait()
        return state, history

    def test(self, state: EmbedTrainState, test_loader,
             results_path: str | None = None,
             score_booster=None) -> dict:
        """Evaluate on the test loader and optionally pickle the results —
        the reference's trainer.test + pickle flow (train/find_lr.py:440-457,
        keys test_loss/test_top3/test_top1/test_scores). ``test_scores``
        carries the per-batch cos_sims (each mapped through
        ``score_booster`` when given — the find_lr cos_sim_score,
        train/find_lr.py:87-95,337) plus their mean under
        ``test_scores_mean``. Means are batch-size-weighted (item-level
        semantics; a ``drop_last=False`` partial final batch must not get
        a full batch's weight)."""
        per_batch, sizes = self._eval_batches(state, test_loader)

        def mean(v):
            return float(np.average(v, weights=sizes)) if v else None

        scores = per_batch.get("cos_sims", [])
        if score_booster is not None:
            scores = [float(score_booster(s)) for s in scores]
        results = {
            "test_loss": mean(per_batch.get("val_loss")),
            "test_top3": mean(per_batch.get("val_top3")),
            "test_top1": mean(per_batch.get("val_top1")),
            "test_scores": scores,
            "test_scores_mean": mean(scores),
        }
        if results_path and self._is_main:
            # main-process-only like every other writer: N processes
            # racing 'wb' on a shared results path can corrupt the pickle
            import os
            import pickle
            os.makedirs(os.path.dirname(results_path) or ".", exist_ok=True)
            with open(results_path, "wb") as f:
                pickle.dump(results, f, protocol=pickle.HIGHEST_PROTOCOL)
        return results
