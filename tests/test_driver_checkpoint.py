"""Driver checkpointing: save/restore round trip, rotation, best tracking."""

import json
import os
import types

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.runtime.driver import Driver, TrainerState


class _FakeWrapper:
    def __init__(self, value):
        self.params = {"w": jnp.full((4,), value)}
        self.resolution = 16


class _FakeModel:
    def __init__(self, value=1.0):
        self.gan_wrapper = _FakeWrapper(value)


def _args(tmp_path, **kw):
    d = dict(output_dir=str(tmp_path), per_device_eval_batch_size=1,
             save_total_limit=2, metric_for_best_model="score",
             greater_is_better=True, num_train_epochs=0)
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_save_load_roundtrip(tmp_path):
    model = _FakeModel(3.0)
    driver = Driver(_args(tmp_path), model)
    driver.save_model()
    assert os.path.exists(os.path.join(tmp_path, "model_params.msgpack"))

    model.gan_wrapper.params = {"w": jnp.zeros((4,))}
    driver.load_model(str(tmp_path))
    np.testing.assert_array_equal(
        np.asarray(model.gan_wrapper.params["w"]), np.full((4,), 3.0)
    )


def test_checkpoint_rotation_keeps_best(tmp_path):
    model = _FakeModel()
    driver = Driver(_args(tmp_path), model)

    driver.state.global_step = 1
    driver._save_checkpoint(metrics={"eval_score": 0.9})
    driver.state.global_step = 2
    driver._save_checkpoint(metrics={"eval_score": 0.5})
    driver.state.global_step = 3
    driver._save_checkpoint(metrics={"eval_score": 0.7})

    remaining = sorted(
        d for d in os.listdir(tmp_path) if d.startswith("checkpoint-")
    )
    assert len(remaining) == 2
    # the best (step 1, score 0.9) must survive rotation
    assert "checkpoint-1" in remaining
    assert driver.state.best_metric == 0.9
    st = TrainerState.load(
        os.path.join(tmp_path, "checkpoint-3", "trainer_state.json")
    )
    assert st.best_model_checkpoint.endswith("checkpoint-1")


def test_train_noop_matches_reference_usage(tmp_path):
    driver = Driver(_args(tmp_path), _FakeModel(), train_dataset=[])
    metrics = driver.train()
    assert "train_runtime" in metrics


def test_metrics_save_and_combined(tmp_path):
    driver = Driver(_args(tmp_path), _FakeModel())
    driver.save_metrics("eval", {"eval_psnr": 30.0})
    driver.save_metrics("test", {"test_psnr": 29.0})
    combined = json.load(open(os.path.join(tmp_path, "all_results.json")))
    assert combined == {"eval_psnr": 30.0, "test_psnr": 29.0}
