"""CycleDiffusion-TPU entry point.

Mirrors the reference CLI surface (``main.py:57-145``):

    python main.py --cfg experiments/<name>.cfg --output_dir output/<name> \
        --seed 42 --do_eval --per_device_eval_batch_size 1 [--do_predict]

Distributed launch flags from the reference's ``torch.distributed.launch``
invocations are accepted and ignored (jax.distributed replaces them); data
parallelism comes from the device mesh, so the reference's 8-shard manual
``range`` splits can run as one job.
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import sys

import numpy as np

logger = logging.getLogger(__name__)


def parse_training_args(argv=None):
    """HF-style flag subset used by the reference README (README.md:150-231).

    Unknown flags (e.g. --local_rank, --ddp_find_unused_parameters) are
    accepted with a warning so reference launch scripts keep working.
    """
    p = argparse.ArgumentParser("cyclediffusion_tpu")
    p.add_argument("--cfg", required=True)
    p.add_argument("--output_dir", default="output/run")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_predict", action="store_true")
    p.add_argument("--num_train_epochs", type=float, default=0)
    p.add_argument("--per_device_train_batch_size", type=int, default=1)
    p.add_argument("--per_device_eval_batch_size", type=int, default=1)
    p.add_argument("--eval_accumulation_steps", type=int, default=1)
    p.add_argument("--metric_for_best_model", default=None)
    p.add_argument("--greater_is_better", type=lambda s: s != "False",
                   default=True)
    p.add_argument("--save_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--report_to", default="none")
    p.add_argument("--run_name", default=None)
    p.add_argument("--verbose", action="store_true")
    args, unknown = p.parse_known_args(argv)
    if unknown:
        logger.warning("ignoring unknown flags (reference-compat): %s", unknown)
    return args


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def get_dataset_splits(args):
    from cyclediffusion_tpu.data import build_raw_datasets, get_multi_task_dataset_splits
    from cyclediffusion_tpu.runtime.config import get_config
    from cyclediffusion_tpu.runtime.registry import get_preprocessor

    cache_root = os.path.join("output", "cache")
    os.makedirs(cache_root, exist_ok=True)
    name2dataset_splits = {}
    for name, arg_path in args.arg_paths:
        task_args = get_config(arg_path)
        raw_splits = build_raw_datasets(task_args.raw_data.data_program)
        preprocessor = get_preprocessor(task_args.preprocess.preprocess_program)
        name2dataset_splits[name] = preprocessor(task_args, args).preprocess(
            raw_splits, cache_root
        )
    return get_multi_task_dataset_splits(
        meta_args=args, name2dataset_splits=name2dataset_splits
    )


def _apply_platform_env() -> None:
    """Honor ``JAX_PLATFORMS`` even when a sitecustomize overrides it.

    Some managed images re-set the platform list programmatically after
    ``import jax`` (so the env var alone is silently ignored, and a dead
    accelerator tunnel blocks backend discovery forever).  Re-applying the
    user's explicit env choice through ``jax.config`` restores the standard
    JAX contract: ``JAX_PLATFORMS=cpu python main.py ...`` runs on CPU.
    """
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)


def main(argv=None):
    _apply_platform_env()
    from cyclediffusion_tpu.runtime.config import get_config
    from cyclediffusion_tpu.runtime.driver import Driver
    from cyclediffusion_tpu.runtime.registry import (
        get_evaluator,
        get_model,
        get_visualizer,
    )
    from cyclediffusion_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    training_args = parse_training_args(argv)
    set_seed(training_args.seed)
    args = get_config(training_args.cfg)

    os.makedirs(training_args.output_dir, exist_ok=True)
    args.output_dir = training_args.output_dir

    dataset_splits = get_dataset_splits(args)
    evaluator = get_evaluator(args.evaluation.evaluator_program)(args)
    visualizer = get_visualizer(args.visualization.visualizer_program)(args)
    model = get_model(args.model.name)(args, base_seed=training_args.seed)

    driver = Driver(
        args=training_args,
        model=model,
        compute_metrics=evaluator.evaluate,
        train_dataset=dataset_splits["train"],
        eval_dataset=dataset_splits["dev"],
        visualizer=visualizer,
    )
    logger.info("Driver built successfully (process %d/%d).",
                driver.process_index, driver.process_count)

    if training_args.resume_from_checkpoint:
        driver.load_model(training_args.resume_from_checkpoint)

    if training_args.do_train:
        metrics = driver.train()
        driver.save_model()
        metrics["train_samples"] = len(dataset_splits["train"])
        driver.log_metrics("train", metrics)
        driver.save_metrics("train", metrics)

    logger.info("*** Evaluate ***")
    metrics = driver.evaluate()
    metrics["eval_samples"] = len(dataset_splits["dev"])
    driver.log_metrics("eval", metrics)
    driver.save_metrics("eval", metrics)

    if training_args.do_predict:
        logger.info("*** Predict ***")
        _, metrics = driver.predict(dataset_splits["test"])
        metrics["predict_samples"] = len(dataset_splits["test"])
        driver.log_metrics("predict", metrics)
        driver.save_metrics("predict", metrics)
    return metrics


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
