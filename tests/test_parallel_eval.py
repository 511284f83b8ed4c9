"""Data-parallel sharded evaluation on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclediffusion_tpu.parallel import (
    batch_sharding,
    data_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)


def test_mesh_helpers(devices):
    mesh = data_mesh()
    assert mesh.devices.size == 8
    arr = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sharded = shard_batch(mesh, {"x": arr})["x"]
    assert sharded.sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(sharded), arr)

    padded, n = pad_to_multiple(np.zeros((5, 2)), 8)
    assert padded.shape == (8, 2) and n == 5


def test_sharded_pipeline_encode_matches_unsharded(devices):
    """The DPM-Encoder scan produces identical results when its batch is
    sharded over the mesh (computation follows data)."""
    from cyclediffusion_tpu.pipelines import DDPMDDIMPipeline
    from cyclediffusion_tpu.pipelines.zoo import tiny_pixel_spec

    spec = tiny_pixel_spec(resolution=16, kind="improved")
    pipe = DDPMDDIMPipeline.random_init(
        spec, jax.random.PRNGKey(0), sample_type="ddim", custom_steps=8,
        es_steps=8, eta=0.1, t_0=7,
    )
    img = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    key = jax.random.PRNGKey(2)

    z_plain = pipe.encode(img, key)

    mesh = data_mesh()
    img_sharded = jax.device_put(img, batch_sharding(mesh, img.ndim))
    z_sharded = pipe.encode(img_sharded, key)
    assert "data" in str(z_sharded.sharding)
    np.testing.assert_allclose(
        np.asarray(z_plain), np.asarray(z_sharded), rtol=2e-5, atol=1e-5
    )


@pytest.mark.slow
def test_driver_eval_on_mesh(tmp_path, devices):
    """Full CLI eval with batch 8 sharded over the 8-device mesh."""
    import json
    import os

    import main as cli

    # enlarge the tiny dataset to 8 samples via the [preprocess] count knob
    from cyclediffusion_tpu.runtime.config import config_root

    cfg_src = open(os.path.join(
        config_root(), "experiments", "tiny_unpaired_translation.cfg")).read()
    cfg_src = cfg_src.replace("[arg_paths]", "[arg_paths]")  # keep structure
    task_src = open(os.path.join(
        config_root(), "tasks", "tiny_cat_dog.cfg")).read()
    task_src = task_src.replace(
        "preprocess_program = tiny_images",
        "preprocess_program = tiny_images\ncount = 8",
    )
    os.makedirs(tmp_path / "experiments", exist_ok=True)
    os.makedirs(tmp_path / "tasks", exist_ok=True)
    cfg_src = cfg_src.replace("tasks/tiny_cat_dog.cfg", "tasks/tiny8.cfg")
    cfg_src = cfg_src.replace("eval_num = 2", "eval_num = 8")
    (tmp_path / "experiments" / "tiny8.cfg").write_text(cfg_src)
    (tmp_path / "tasks" / "tiny8.cfg").write_text(task_src)

    os.environ["CYCLEDIFFUSION_CONFIG_ROOT"] = str(tmp_path)
    try:
        out = str(tmp_path / "out")
        metrics = cli.main([
            "--cfg", "experiments/tiny8.cfg",
            "--output_dir", out,
            "--seed", "7",
            "--do_eval",
            "--per_device_eval_batch_size", "8",
        ])
        results = json.load(open(os.path.join(out, "eval_results.json")))
        assert results["eval_samples"] == 8
    finally:
        del os.environ["CYCLEDIFFUSION_CONFIG_ROOT"]


def test_candidate_ensemble_sharded_matches_unsharded(devices):
    """The text pipeline's candidate axis sharded over the data mesh gives
    identical z-ensembles and decoded candidates (VERDICT r1 item 5)."""
    from cyclediffusion_tpu.energy.clean_clip import CLIPScorer, DirectionalCLIP
    from cyclediffusion_tpu.models.clip import CLIPConfig
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffusionCore,
    )
    from cyclediffusion_tpu.pipelines.latent_text import StochasticTextPipeline
    from cyclediffusion_tpu.text import HashTokenizer

    core = LatentDiffusionCore.random_init(
        LatentCoreSpec.tiny(cond_kind="clip"), jax.random.PRNGKey(0)
    )
    clip_cfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                          vision_layers=2, vision_heads=2, patch_size=8,
                          vocab_size=96, context_length=16, text_width=32,
                          text_layers=2, text_heads=2)
    dclip = DirectionalCLIP(
        CLIPScorer.random_init(jax.random.PRNGKey(1), clip_cfg),
        HashTokenizer(96, 16),
    )
    kw = dict(
        custom_steps=6, eta=0.1, white_box_steps=7, skip_steps=[0, 2],
        encoder_unconditional_guidance_scales=[1.0],
        decoder_unconditional_guidance_scales=[1.0, 3.0],
        n_trials=3,  # 3 trials x 2 skips = 6 encode chains; 12 decodes
    )
    tok = HashTokenizer(96, 16)
    plain = StochasticTextPipeline(core, tok, dclip, **kw)
    sharded = StochasticTextPipeline(core, tok, dclip, mesh=data_mesh(), **kw)

    image = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    src, tgt = ["a cat"], ["a dog"]
    z_plain = plain.encode(image, src, jax.random.PRNGKey(3))
    z_shard = sharded.encode(image, src, jax.random.PRNGKey(3))
    assert len(z_plain) == len(z_shard) == 6
    for a, b in zip(z_plain, z_shard):
        # padding to the mesh extent changes the vmap batch size, which can
        # reorder float reductions — tolerance covers that, nothing else
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    best_p, combos_p = plain.forward(z_plain, image, src, tgt,
                                     jax.random.PRNGKey(4))
    best_s, combos_s = sharded.forward(z_shard, image, src, tgt,
                                       jax.random.PRNGKey(4))
    assert combos_p == combos_s
    np.testing.assert_allclose(np.asarray(best_p), np.asarray(best_s),
                               rtol=1e-4, atol=1e-4)
