"""End-to-end CLI tests: main.py on the tiny configs (random-init models).

These exercise the full stack — config, registry, data, tasks, pipelines,
ensemble ranking, evaluators, visualization, metric persistence — without any
checkpoint or tokenizer assets.
"""

import json
import os

import pytest

import main as cli


@pytest.mark.slow
def test_tiny_unpaired_translation_e2e(tmp_path):
    out = str(tmp_path / "unpaired")
    metrics = cli.main([
        "--cfg", "experiments/tiny_unpaired_translation.cfg",
        "--output_dir", out,
        "--seed", "42",
        "--do_eval",
        "--per_device_eval_batch_size", "2",
    ])
    assert "eval_runtime" in metrics
    results = json.load(open(os.path.join(out, "eval_results.json")))
    assert results["eval_samples"] == 2
    vis = os.listdir(os.path.join(out, "visualization"))
    assert any(f.startswith("eval_") for f in vis)


@pytest.mark.slow
def test_tiny_unpaired_latent_e2e(tmp_path):
    """The LatentDiffStochastic gan_type end to end (BASELINE tracked
    config 2's wrapper): uncond VQ-f4 latent LDMs, eps-replay + eta=1
    refine, quantized VQ decode — the 4th and last factory dispatch with
    CLI coverage."""
    out = str(tmp_path / "unpaired_latent")
    metrics = cli.main([
        "--cfg", "experiments/tiny_unpaired_latent.cfg",
        "--output_dir", out,
        "--seed", "42",
        "--do_eval",
        "--per_device_eval_batch_size", "2",
    ])
    assert "eval_runtime" in metrics
    results = json.load(open(os.path.join(out, "eval_results.json")))
    assert results["eval_samples"] == 2
    vis = os.listdir(os.path.join(out, "visualization"))
    assert any(f.startswith("eval_") for f in vis)


@pytest.mark.slow
def test_tiny_text_translation_e2e(tmp_path):
    out = str(tmp_path / "text")
    metrics = cli.main([
        "--cfg", "experiments/tiny_text_translation.cfg",
        "--output_dir", out,
        "--seed", "42",
        "--do_eval",
        "--per_device_eval_batch_size", "2",
    ])
    assert "eval_translate/psnr" in metrics
    assert "eval_translate/d-clip" in metrics
    assert "eval_avr" in metrics
    # per-sample CSV from the translate_text evaluator
    assert os.path.exists(os.path.join(out, "eval_results.csv"))
    results = json.load(open(os.path.join(out, "all_results.json")))
    assert "eval_translate/ssim" in results


@pytest.mark.slow
def test_tiny_text_translation_latent_e2e(tmp_path):
    """The LatentDiffStochasticText gan_type end to end (BASELINE tracked
    config 3's wrapper): BERT-cond LDM text pipeline with the candidate
    ensemble + DirectionalCLIP ranking — completes CLI coverage of all
    four factory dispatches (reference get_gan_wrapper.py:17-30)."""
    out = str(tmp_path / "text_latent")
    metrics = cli.main([
        "--cfg", "experiments/tiny_text_translation_latent.cfg",
        "--output_dir", out,
        "--seed", "42",
        "--do_eval",
        "--per_device_eval_batch_size", "2",
    ])
    assert "eval_translate/psnr" in metrics
    assert "eval_translate/d-clip" in metrics
    assert os.path.exists(os.path.join(out, "eval_results.csv"))


@pytest.mark.slow
def test_tiny_text_translation_fast_mode_e2e(tmp_path):
    """fast_key_every flows cfg -> factory -> cached encode/decode chains."""
    out = str(tmp_path / "text_fast")
    metrics = cli.main([
        "--cfg", "experiments/tiny_text_translation_fast.cfg",
        "--output_dir", out,
        "--seed", "42",
        "--do_eval",
        "--per_device_eval_batch_size", "2",
    ])
    assert "eval_translate/psnr" in metrics
    assert all(map(lambda v: v == v, metrics.values()))  # no NaNs
