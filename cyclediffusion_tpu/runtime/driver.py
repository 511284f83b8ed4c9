"""Sharded inference driver — the reference Trainer's capability surface on a
device mesh.

Parity map against ``trainer/trainer.py`` (1,119 LoC):
* DDP wrap + DistributedSampler/ShardSampler (:174-179, :259-330) -> a 1-D
  ``data`` mesh; eval batches are host-sharded across processes and
  device-sharded across local devices (:class:`EvalLoader`).
* evaluation_loop with cross-rank ``distributed_concat`` + host offload +
  truncation (:793-896) -> :meth:`Driver.evaluation_loop` (device->host per
  batch, ``multihost_utils.process_allgather`` when multi-process).
* train loop with grad-accum/clip, optimizer excluding the frozen pipelines
  (:204-245, :902-1015) -> :meth:`Driver.train` over an optional
  ``model.trainable_variables`` (the reference task models have none; the
  loop degrades to the same no-op with identical logging).
* checkpoint save/rotate/best/resume + RNG capture (:376-507, :991-1009) ->
  :meth:`Driver._save_checkpoint` et al. (msgpack state via flax
  serialization, trainer_state.json, save_total_limit rotation).
* speed_metrics (:118-139), log_metrics/save_metrics (:603-726) ->
  :func:`speed_metrics`, :meth:`Driver.log_metrics` / :meth:`save_metrics`.
* wandb logging (:38-54, :332-352) -> gated (wandb absent in this image).
"""

from __future__ import annotations

import json
import logging
import math
import os
import re
import shutil
import time
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

PREFIX_CHECKPOINT_DIR = "checkpoint"


def speed_metrics(split: str, start_time: float, num_samples: int = None,
                  num_steps: int = None) -> Dict[str, float]:
    """Parity: trainer.py:118-139."""
    runtime = time.time() - start_time
    result = {f"{split}_runtime": round(runtime, 4)}
    if runtime == 0:
        return result
    if num_samples is not None:
        result[f"{split}_samples_per_second"] = round(num_samples / runtime, 3)
    if num_steps is not None:
        result[f"{split}_steps_per_second"] = round(num_steps / runtime, 3)
    return result


class EvalLoader:
    """Shard-and-batch an eval dataset: contiguous shard per process, then
    fixed-size batches (last batch ragged), mirroring ShardSampler semantics
    (:288-302) without the repeat-padding (truncation happens naturally)."""

    def __init__(self, dataset, batch_size: int, process_index: int = 0,
                 process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        n = len(dataset)
        per = math.ceil(n / process_count)
        self.indices = list(range(process_index * per,
                                  min((process_index + 1) * per, n)))
        if process_count > 1 and n > 0:
            # wrap-pad every shard to the same length (ShardSampler :288-302
            # repeat-padding) so cross-process allgather sees uniform shapes;
            # the gather truncates back to len(dataset), dropping duplicates
            while len(self.indices) < per:
                self.indices.append(len(self.indices) % n)

    def __iter__(self):
        for i in range(0, len(self.indices), self.batch_size):
            idxs = self.indices[i : i + self.batch_size]
            items = [self.dataset[j] for j in idxs]
            batch = {}
            for k in items[0].keys():
                vals = [it[k] for it in items]
                if isinstance(vals[0], np.ndarray):
                    batch[k] = np.stack(vals)
                else:
                    batch[k] = vals
            yield batch

    def __len__(self):
        return math.ceil(len(self.indices) / self.batch_size) if self.indices else 0


def gather_sharded_outputs(arrays, n: int, process_count: int, allgather=None):
    """Cross-process gather of per-shard eval outputs (images AND losses).

    Parity: the reference all-gathers every eval output across ranks
    (``trainer/trainer.py:43-61,833``) — not just images.  Each value's
    leading axis is this process's contiguous shard (EvalLoader order); the
    gather pads ragged tails to ``ceil(n / process_count)``, stacks
    process-major, flattens, and truncates to ``n``, preserving dataset
    order.  ``allgather`` is injectable for single-host tests; defaults to
    ``jax.experimental.multihost_utils.process_allgather``.
    """
    if process_count <= 1:
        return {
            k: _pad_leading(np.asarray(v), n) for k, v in arrays.items()
        }
    if allgather is None:
        from jax.experimental import multihost_utils

        allgather = multihost_utils.process_allgather
    per = math.ceil(n / process_count)
    out = {}
    for k, v in arrays.items():
        # EvalLoader wrap-pads every shard to ``per`` items, so shapes are
        # uniform across processes; _pad_leading is belt-and-braces
        g = np.asarray(allgather(_pad_leading(np.asarray(v), per)))
        out[k] = g.reshape((-1,) + g.shape[2:])[:n]
    return out


def _pad_leading(a: np.ndarray, width: int) -> np.ndarray:
    if a.shape[0] >= width:
        return a[:width]
    pad = np.zeros((width - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], axis=0)


class TrainerState:
    """Parity with the HF TrainerState subset the reference persists."""

    def __init__(self):
        self.epoch = 0.0
        self.global_step = 0
        self.best_metric = None
        self.best_model_checkpoint = None
        self.log_history: List[dict] = []

    def to_dict(self):
        return dict(self.__dict__)

    def save(self, path):
        json.dump(self.to_dict(), open(path, "w"), indent=2)

    @classmethod
    def load(cls, path):
        st = cls()
        st.__dict__.update(json.load(open(path)))
        return st


class Driver:
    """train() / evaluate() / predict() with the reference Trainer surface."""

    def __init__(self, args, model, compute_metrics=None, train_dataset=None,
                 eval_dataset=None, visualizer=None):
        self.args = args
        self.model = model
        self.compute_metrics = compute_metrics
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.visualizer = visualizer
        self.state = TrainerState()
        import jax

        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        # local data-parallel mesh: eval batches shard over all local devices
        # (computation follows data through the pipelines' jitted scans)
        self.mesh = None
        if jax.local_device_count() > 1:
            from cyclediffusion_tpu.parallel import data_mesh

            self.mesh = data_mesh(jax.local_devices())
            logger.info("data-parallel mesh over %d local devices",
                        jax.local_device_count())
        os.makedirs(args.output_dir, exist_ok=True)

    def _shard_batch(self, batch: dict) -> dict:
        """device_put array batch entries with batch-axis sharding when the
        batch divides the mesh; non-arrays and ragged batches pass through."""
        if self.mesh is None:
            return batch
        import jax

        from cyclediffusion_tpu.parallel import batch_sharding

        n_dev = self.mesh.devices.size
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1 \
                    and v.shape[0] % n_dev == 0 and v.dtype != object:
                out[k] = jax.device_put(
                    v, batch_sharding(self.mesh, v.ndim)
                )
            else:
                out[k] = v
        return out

    # ---- logging / metrics ------------------------------------------------ #

    def is_world_process_zero(self) -> bool:
        return self.process_index == 0

    def _wandb(self):
        """Lazy rank-0 wandb handle; None when disabled or not installed.

        Parity: the reference inits wandb on rank 0 (``main.py:38-54``) and
        logs every metric dict (``trainer/trainer.py:332-352``).  wandb is an
        optional dependency here — absence degrades to console/JSON logging
        with a one-time warning.
        """
        if not hasattr(self, "_wandb_run"):
            self._wandb_run = None
            report_to = str(getattr(self.args, "report_to", "none") or "none")
            if self.is_world_process_zero() and "wandb" in report_to:
                try:
                    import wandb

                    if wandb.run is None:
                        wandb.init(
                            project=os.environ.get(
                                "WANDB_PROJECT", "cyclediffusion_tpu"),
                            name=os.path.basename(
                                str(getattr(self.args, "cfg", "run"))),
                            config={k: v for k, v in vars(self.args).items()
                                    if isinstance(v, (int, float, str, bool))},
                        )
                    self._wandb_run = wandb
                except ImportError:
                    logger.warning(
                        "report_to includes 'wandb' but wandb is not "
                        "installed; metrics go to console/JSON only.")
        return self._wandb_run

    def log(self, logs: dict) -> None:
        logs["step"] = self.state.global_step
        self.state.log_history.append(logs)
        logger.info("%s", logs)
        wb = self._wandb()
        if wb is not None:
            wb.log(logs, step=self.state.global_step)

    def metrics_format(self, metrics: dict) -> dict:
        out = {}
        for k, v in metrics.items():
            if "_runtime" in k:
                out[k] = f"{v}s"
            elif isinstance(v, float):
                out[k] = round(v, 4)
            else:
                out[k] = v
        return out

    def log_metrics(self, split: str, metrics: dict) -> None:
        if not self.is_world_process_zero():
            return
        print(f"***** {split} metrics *****")
        fmt = self.metrics_format(metrics)
        width = max((len(str(k)) for k in fmt), default=0)
        for key in sorted(fmt.keys()):
            print(f"  {key: <{width}} = {fmt[key]}")

    def save_metrics(self, split: str, metrics: dict, combined: bool = True
                     ) -> None:
        if not self.is_world_process_zero():
            return
        path = os.path.join(self.args.output_dir, f"{split}_results.json")
        json.dump(metrics, open(path, "w"), indent=4, sort_keys=True,
                  default=float)
        if combined:
            all_path = os.path.join(self.args.output_dir, "all_results.json")
            all_metrics = (
                json.load(open(all_path)) if os.path.exists(all_path) else {}
            )
            all_metrics.update(metrics)
            json.dump(all_metrics, open(all_path, "w"), indent=4,
                      sort_keys=True, default=float)

    # ---- checkpointing ---------------------------------------------------- #

    def _sorted_checkpoints(self) -> List[str]:
        out_dir = self.args.output_dir
        paths = []
        for name in os.listdir(out_dir):
            m = re.match(rf"{PREFIX_CHECKPOINT_DIR}-(\d+)$", name)
            full = os.path.join(out_dir, name)
            if m and os.path.isdir(full):
                paths.append((int(m.group(1)), full))
        ordered = [p for _, p in sorted(paths)]
        # never delete the best checkpoint (parity :428-451)
        best = self.state.best_model_checkpoint
        if best and best in ordered:
            ordered.remove(best)
            ordered.append(best)
        return ordered

    def _rotate_checkpoints(self) -> None:
        limit = getattr(self.args, "save_total_limit", None)
        if not limit or limit <= 0:
            return
        ckpts = self._sorted_checkpoints()
        while len(ckpts) > limit:
            victim = ckpts.pop(0)
            logger.info("Deleting older checkpoint %s", victim)
            shutil.rmtree(victim, ignore_errors=True)

    def save_model(self, output_dir: Optional[str] = None) -> None:
        """Serialize pipeline params + state (parity save_model :376-390)."""
        if not self.is_world_process_zero():
            return
        output_dir = output_dir or self.args.output_dir
        os.makedirs(output_dir, exist_ok=True)
        from flax import serialization

        params = self._gather_model_params()
        with open(os.path.join(output_dir, "model_params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(params))
        json.dump(
            {k: v for k, v in vars(self.args).items()
             if isinstance(v, (int, float, str, bool, type(None)))},
            open(os.path.join(output_dir, "training_args.json"), "w"),
            indent=2,
        )

    def _gather_model_params(self) -> dict:
        params = {}
        for attr in ("gan_wrapper", "source_gan_wrapper", "target_gan_wrapper"):
            wrapper = getattr(self.model, attr, None)
            if wrapper is None:
                continue
            if hasattr(wrapper, "params"):
                params[attr] = wrapper.params
            elif hasattr(wrapper, "core"):
                params[attr] = wrapper.core.params
        # the tree actually being optimized (if any) — without it a resumed
        # run would silently restore frozen pipeline weights only
        trainable = getattr(self.model, "trainable_params", None)
        if trainable is not None:
            params["trainable_params"] = trainable
        return params

    def load_model(self, checkpoint_dir: str) -> None:
        from flax import serialization

        path = os.path.join(checkpoint_dir, "model_params.msgpack")
        template = self._gather_model_params()
        with open(path, "rb") as f:
            restored = serialization.from_bytes(template, f.read())
        for attr, params in restored.items():
            if attr == "trainable_params":
                self.model.trainable_params = params
                continue
            wrapper = getattr(self.model, attr)
            if hasattr(wrapper, "params"):
                wrapper.params = params
            else:
                wrapper.core.params = params

    def _save_checkpoint(self, metrics: Optional[dict] = None) -> None:
        ckpt_dir = os.path.join(
            self.args.output_dir,
            f"{PREFIX_CHECKPOINT_DIR}-{self.state.global_step}",
        )
        self.save_model(ckpt_dir)
        if metrics is not None:
            mkey = getattr(self.args, "metric_for_best_model", None)
            if mkey:
                mkey = mkey if mkey.startswith("eval_") else f"eval_{mkey}"
                value = metrics.get(mkey)
                greater = getattr(self.args, "greater_is_better", True)
                if value is not None and (
                    self.state.best_metric is None
                    or (value > self.state.best_metric) == bool(greater)
                ):
                    self.state.best_metric = float(value)
                    self.state.best_model_checkpoint = ckpt_dir
        if self.is_world_process_zero():
            self.state.save(os.path.join(ckpt_dir, "trainer_state.json"))
            np.save(
                os.path.join(ckpt_dir, f"rng_state_{self.process_index}.npy"),
                np.random.get_state()[1],
            )
            self._rotate_checkpoints()

    # ---- evaluation ------------------------------------------------------- #

    def evaluation_loop(self, dataset, description: str, split: str):
        batch_size = getattr(self.args, "per_device_eval_batch_size", 1)
        loader = EvalLoader(dataset, batch_size, self.process_index,
                            self.process_count)
        logger.info("***** Running %s *****", description)
        logger.info("  Num examples = %d", len(dataset))
        logger.info("  Batch size = %d", batch_size)

        originals, translated, losses_acc = [], [], []
        losses_dict: Dict[str, list] = {}
        for step, batch in enumerate(loader):
            batch = self._shard_batch(batch)
            (orig, img), weighted_loss, losses = self.model.forward(**batch)
            originals.append(np.asarray(orig))
            translated.append(np.asarray(img))
            losses_acc.extend(np.asarray(weighted_loss).tolist())
            for k, v in losses.items():
                losses_dict.setdefault(k, []).extend(np.asarray(v).tolist())

        local_orig = (
            np.concatenate(originals) if originals
            else np.zeros((0,))
        )
        local_trans = (
            np.concatenate(translated) if translated
            else np.zeros((0,))
        )
        n = len(dataset)
        gathered = gather_sharded_outputs(
            {
                "orig": local_orig,
                "trans": local_trans,
                "weighted_loss": np.asarray(losses_acc, np.float32),
                **{f"loss/{k}": np.asarray(v, np.float32)
                   for k, v in losses_dict.items()},
            },
            n=n, process_count=self.process_count,
        )
        local_orig, local_trans = gathered["orig"], gathered["trans"]
        losses_acc = gathered["weighted_loss"].tolist()
        losses_dict = {k: gathered[f"loss/{k}"].tolist() for k in losses_dict}

        metrics = {}
        if self.compute_metrics is not None and self.is_world_process_zero():
            metrics = self.compute_metrics(
                images=(local_orig, local_trans),
                model=self.model,
                weighted_loss=losses_acc,
                losses=losses_dict,
                dataset=dataset,
                split=split,
            )
        metrics = {f"{split}_{k}": v for k, v in metrics.items()}
        return (local_orig, local_trans), metrics

    def evaluate(self, eval_dataset=None):
        dataset = eval_dataset if eval_dataset is not None else self.eval_dataset
        start = time.time()
        images, metrics = self.evaluation_loop(dataset, "Evaluation", "eval")
        metrics.update(speed_metrics("eval", start, num_samples=len(dataset)))
        self.log(dict(metrics))
        if self.visualizer is not None and self.is_world_process_zero():
            self.visualize(images, "eval")
        return metrics

    def predict(self, test_dataset):
        start = time.time()
        images, metrics = self.evaluation_loop(test_dataset, "Prediction",
                                               "test")
        metrics.update(speed_metrics("test", start,
                                     num_samples=len(test_dataset)))
        self.log(dict(metrics))
        if self.visualizer is not None and self.is_world_process_zero():
            self.visualize(images, "test")
        return images, metrics

    def visualize(self, images, description: str) -> None:
        save_dir = os.path.join(self.args.output_dir, "visualization")
        os.makedirs(save_dir, exist_ok=True)
        self.visualizer.visualize(
            images=images, model=self.model, description=description,
            save_dir=save_dir, step=self.state.global_step,
        )

    # ---- training --------------------------------------------------------- #

    def _build_optimizer(self, params):
        """Optimizer build (parity :204-245): AdamW (default) or Adafactor,
        excluding frozen pipeline params — in this framework the pipelines
        hold their params outside the trainable tree by construction."""
        import optax

        lr = float(getattr(self.args, "learning_rate", 5e-5))
        wd = float(getattr(self.args, "weight_decay", 0.0))
        clip = float(getattr(self.args, "max_grad_norm", 1.0))
        name = getattr(self.args, "optim", "adamw")
        # LR schedule (parity :190-202): linear decay with optional warmup
        warmup = int(getattr(self.args, "warmup_steps", 0))
        total = int(getattr(self.args, "max_steps", 0))
        sched_name = getattr(self.args, "lr_scheduler_type", "constant")
        if sched_name == "linear" and total > 0:
            if warmup > 0:
                lr_sched = optax.join_schedules(
                    [
                        optax.linear_schedule(0.0, lr, warmup),
                        optax.linear_schedule(lr, 0.0, max(total - warmup, 1)),
                    ],
                    boundaries=[warmup],
                )
            else:
                # no warmup: start at full lr (HF schedule parity :190-202 —
                # a synthetic 1-step warmup would zero the first update)
                lr_sched = optax.linear_schedule(lr, 0.0, total)
        elif warmup > 0:
            lr_sched = optax.linear_schedule(0.0, lr, warmup)
        else:
            lr_sched = lr
        if name == "adafactor":
            base = optax.adafactor(learning_rate=lr_sched)
        else:
            base = optax.adamw(learning_rate=lr_sched, weight_decay=wd)
        tx = optax.chain(optax.clip_by_global_norm(clip), base)
        return tx, tx.init(params)

    def train(self, resume_from_checkpoint: Optional[str] = None):
        """Training loop with grad accumulation + clipping (parity :902-1015).

        The reference's experiments all run ``num_train_epochs 0`` with
        zero-placeholder losses; the loop below is functional for any model
        exposing ``trainable_params`` and
        ``loss_fn(params, batch, key) -> loss`` (and degrades to the same
        logged no-op otherwise).
        """
        import jax

        if resume_from_checkpoint:
            self.load_model(resume_from_checkpoint)
            state_path = os.path.join(resume_from_checkpoint,
                                      "trainer_state.json")
            if os.path.exists(state_path):
                self.state = TrainerState.load(state_path)

        epochs = int(getattr(self.args, "num_train_epochs", 0))
        n_train = len(self.train_dataset) if self.train_dataset else 0
        trainable = getattr(self.model, "trainable_params", None)
        loss_fn = getattr(self.model, "loss_fn", None)
        start = time.time()
        if epochs <= 0 or n_train == 0 or trainable is None or loss_fn is None:
            logger.info(
                "No training to do (num_train_epochs=%d, train examples=%d, "
                "trainable=%s) — matching the reference's inference-only "
                "usage.", epochs, n_train, trainable is not None,
            )
            metrics = speed_metrics("train", start, num_samples=0, num_steps=0)
            self.log(dict(metrics))
            return metrics

        batch_size = int(getattr(self.args, "per_device_train_batch_size", 1))
        accum = int(getattr(self.args, "gradient_accumulation_steps", 1))
        logging_steps = int(getattr(self.args, "logging_steps", 10))
        save_steps = int(getattr(self.args, "save_steps", 0))

        params = trainable
        tx, opt_state = self._build_optimizer(params)
        grad_fn = jax.jit(jax.value_and_grad(loss_fn))

        import numpy as _np

        rng = _np.random.RandomState(int(getattr(self.args, "seed", 0)))
        key = jax.random.PRNGKey(int(getattr(self.args, "seed", 0)))
        steps = 0
        loss = None
        import optax

        def _allreduce_mean(tree):
            """Average a grad tree across processes (reference DDP grad
            averaging, trainer.py:174-179) — without this, multi-process
            parameter replicas silently diverge after the first step."""
            if self.process_count <= 1:
                return tree
            from jax.experimental import multihost_utils

            return jax.tree.map(
                lambda g: multihost_utils.process_allgather(g).mean(axis=0),
                tree,
            )

        for epoch in range(epochs):
            # reset per epoch: a ragged tail (epoch length not a multiple of
            # gradient_accumulation_steps) must not leak into the next epoch
            accum_grads = None
            order = rng.permutation(n_train)
            shard = order[self.process_index::self.process_count]
            for i in range(0, len(shard) - batch_size + 1, batch_size):
                items = [self.train_dataset[int(j)]
                         for j in shard[i:i + batch_size]]
                batch = {
                    k: (np.stack([it[k] for it in items])
                        if isinstance(items[0][k], (np.ndarray, np.generic))
                        else [it[k] for it in items])
                    for k in items[0]
                }
                key, sub = jax.random.split(key)
                loss, grads = grad_fn(params, batch, sub)
                accum_grads = grads if accum_grads is None else jax.tree.map(
                    lambda a, b: a + b, accum_grads, grads
                )
                if (i // batch_size + 1) % accum == 0:
                    mean_grads = jax.tree.map(lambda g: g / accum, accum_grads)
                    mean_grads = _allreduce_mean(mean_grads)
                    updates, opt_state = tx.update(mean_grads, opt_state,
                                                   params)
                    params = optax.apply_updates(params, updates)
                    accum_grads = None
                    steps += 1
                    self.state.global_step = steps
                    if logging_steps and steps % logging_steps == 0:
                        self.log({"loss": float(loss), "epoch": epoch})
                    if save_steps and steps % save_steps == 0:
                        self.model.trainable_params = params
                        # best-model tracking needs eval metrics at save time
                        # (parity _maybe_log_save_evaluate :509-563)
                        metrics = (self.evaluate() if getattr(
                            self.args, "metric_for_best_model", None)
                            else None)
                        self._save_checkpoint(metrics)
            self.state.epoch = float(epoch + 1)

        self.model.trainable_params = params
        # load-best-at-end (parity :991-1009)
        if getattr(self.args, "load_best_model_at_end", False) \
                and self.state.best_model_checkpoint:
            logger.info("Loading best model from %s (score: %s)",
                        self.state.best_model_checkpoint,
                        self.state.best_metric)
            self.load_model(self.state.best_model_checkpoint)
        metrics = speed_metrics("train", start, num_samples=n_train * epochs,
                                num_steps=steps)
        if loss is not None:
            metrics["train_loss"] = float(loss)
        else:
            # per-process shard smaller than the batch size: no step ran
            logger.warning(
                "No optimizer step ran: per-process shard (%d examples) is "
                "smaller than per_device_train_batch_size=%d.",
                len(shard), batch_size,
            )
        self.log(dict(metrics))
        return metrics
