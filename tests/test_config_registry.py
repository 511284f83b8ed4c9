"""Config-system and registry tests (reference grammar parity)."""

import pytest

from cyclediffusion_tpu.runtime.config import Args, get_config, parse_string
from cyclediffusion_tpu.runtime.registry import (
    get_evaluator,
    get_model,
    get_preprocessor,
    get_visualizer,
)


def test_parse_string_grammar():
    assert parse_string("3") == 3
    assert parse_string("0.1") == 0.1
    assert parse_string("True") is True
    assert parse_string("false") is False
    assert parse_string("None") is None
    assert parse_string("[1, 1.5, 2]") == [1, 1.5, 2]
    assert parse_string("[15, 20, 25]") == [15, 20, 25]
    assert parse_string("sd-v1-4.ckpt") == "sd-v1-4.ckpt"
    assert parse_string("tasks/translate_text512.cfg") == "tasks/translate_text512.cfg"


def test_args_iteration_and_contains():
    a = Args(x=1, y="z")
    assert dict(iter(a)) == {"x": 1, "y": "z"}
    assert "x" in a and "missing" not in a


def test_get_config_experiment_surface():
    args = get_config("experiments/translate_text2img256_stable_diffusion_stochastic_1.cfg")
    assert args.model.name == "text_unsupervised_translation"
    assert args.gan.gan_type == "SDStochasticText"
    assert args.gan.custom_steps == 99
    assert args.gan.white_box_steps == 100
    assert args.gan.eta == 0.1
    assert args.gan.skip_steps == [15, 20, 25, 30, 40, 50]
    assert args.gan.decoder_unconditional_guidance_scales == [1, 1.5, 2, 3, 4, 5]
    assert args.gan.n_trials == 15
    assert args.raw_data.range == [0, 16]
    assert args.arg_paths.translate == "tasks/translate_text512.cfg"
    assert args.evaluation.evaluator_program == "multi_task"
    assert args.PriorZEnergy.weight == 1


def test_get_config_task_surface():
    args = get_config("tasks/translate_cat_dog.cfg")
    assert args.preprocess.preprocess_program == "afhqcat256"
    assert args.evaluation.evaluator_program == "translate_to_dog"


def test_get_config_missing_raises():
    with pytest.raises(FileNotFoundError):
        get_config("experiments/does_not_exist.cfg")


def test_registry_resolves_all_extension_points():
    assert get_model("text_unsupervised_translation").__name__ == "TextUnsupervisedTranslation"
    assert get_model("unsupervised_translation").__name__ == "UnsupervisedTranslation"
    for p in ["translate_text512", "translate_text256", "afhqcat256",
              "afhqwild256", "ffhq256", "tiny_text", "tiny_images"]:
        assert get_preprocessor(p) is not None
    for e in ["multi_task", "translate_text", "translate_to_dog", "empty"]:
        assert get_evaluator(e) is not None
    assert get_visualizer("multi_image") is not None


def test_all_reference_experiment_configs_load():
    import os

    from cyclediffusion_tpu.runtime.config import config_root

    exp_dir = os.path.join(config_root(), "experiments")
    names = [n for n in os.listdir(exp_dir) if n.endswith(".cfg")]
    assert len(names) >= 21  # 8 SD + 8 LDM shards, full variants, 3 unpaired, tiny
    for name in names:
        args = get_config(f"experiments/{name}")
        assert args.gan.gan_type in {
            "SDStochasticText", "LatentDiffStochasticText",
            "LatentDiffStochastic", "DDPM_DDIM",
        }
