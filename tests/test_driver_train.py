"""The Driver's training loop actually optimizes (toy regression model)."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.runtime.driver import Driver


class _ToyModel:
    """Linear regression y = w.x learnable through the Driver loop."""

    def __init__(self):
        self.trainable_params = {"w": jnp.zeros((3,))}
        self.gan_wrapper = types.SimpleNamespace(params={"w": jnp.zeros((1,))})

    @staticmethod
    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"]
        return jnp.mean((pred - batch["y"]) ** 2)


def _dataset(n=64, seed=0):
    rng = np.random.RandomState(seed)
    w_true = np.array([1.0, -2.0, 0.5], np.float32)
    xs = rng.randn(n, 3).astype(np.float32)
    ys = xs @ w_true
    return [{"x": xs[i], "y": ys[i]} for i in range(n)], w_true


class _Wrap:
    def __init__(self, items):
        self.items = items

    def __getitem__(self, i):
        return self.items[i]

    def __len__(self):
        return len(self.items)


def test_train_loop_reduces_loss(tmp_path):
    items, w_true = _dataset()
    model = _ToyModel()
    args = types.SimpleNamespace(
        output_dir=str(tmp_path), num_train_epochs=60, learning_rate=0.1,
        per_device_train_batch_size=8, gradient_accumulation_steps=2,
        logging_steps=0, save_steps=0, seed=0, max_grad_norm=1.0,
        weight_decay=0.0, optim="adamw",
    )
    driver = Driver(args, model, train_dataset=_Wrap(items))
    metrics = driver.train()
    assert metrics["train_loss"] < 0.05, metrics
    w = np.asarray(model.trainable_params["w"])
    np.testing.assert_allclose(w, w_true, atol=0.2)


def test_train_noop_without_trainables(tmp_path):
    model = _ToyModel()
    model.loss_fn = None  # simulate a model with no training objective
    args = types.SimpleNamespace(output_dir=str(tmp_path), num_train_epochs=1)
    driver = Driver(args, model, train_dataset=_Wrap([]))
    metrics = driver.train()
    assert "train_runtime" in metrics


def test_wandb_surface_gated_and_logged(tmp_path, monkeypatch):
    """report_to=wandb routes log() through a wandb module when importable
    (a fake here), and degrades silently to console logging otherwise."""
    import sys
    import types

    from cyclediffusion_tpu.runtime.driver import Driver

    calls = []
    fake = types.ModuleType("wandb")
    fake.run = None

    def init(**kw):
        fake.run = object()
        calls.append(("init", kw))

    fake.init = init
    fake.log = lambda logs, step=None: calls.append(("log", dict(logs), step))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    args = types.SimpleNamespace(
        output_dir=str(tmp_path), report_to="wandb", cfg="experiments/x.cfg",
        seed=0,
    )
    drv = Driver.__new__(Driver)
    drv.args = args
    drv.process_index = 0
    drv.process_count = 1
    from cyclediffusion_tpu.runtime.driver import TrainerState

    drv.state = TrainerState()
    drv.log({"loss": 1.0})
    assert [c[0] for c in calls] == ["init", "log"]
    assert calls[1][1]["loss"] == 1.0

    # absence of wandb degrades gracefully
    monkeypatch.delitem(sys.modules, "wandb")
    import builtins

    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_wandb)
    drv2 = Driver.__new__(Driver)
    drv2.args = args
    drv2.process_index = 0
    drv2.process_count = 1
    drv2.state = TrainerState()
    drv2.log({"loss": 2.0})  # must not raise
    assert drv2._wandb() is None
