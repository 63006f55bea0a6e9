"""Multi-seed sweep runner: the paper's N-seeds-per-config protocol as ONE
vmapped compiled program (see ``train/ensemble.py``).

Equivalent to N invocations of ``run_mm_late`` differing only in ``--seed``;
per-seed artifacts use the standard naming so downstream analysis is
unchanged.

    python -m ....cli.run_seed_sweep --txt_model_name bernice \
        --img_model_name vit --fusion_name attention --task 2 \
        --seeds 30,40,50 --epochs 7 --use_clip_loss --use_tim_loss
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..core import config as C
from ..models.fusion import init_mm_late_params
from ..train.checkpoint import save_params
from ..train.ensemble import EnsembleTrainer, stack_seed_params
from ..utils.logging import get_logger
from ._build import build_mm_late_setup
from ._common import (add_common_args, results_dir_for, save_predictions_csv,
                      seed_everything)

logger = get_logger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="vmapped multi-seed late-fusion sweep")
    parser.add_argument("--txt_model_name", type=str,
                        choices=["bert", "bernice", "bertweet", "roberta"])
    parser.add_argument("--img_model_name", type=str,
                        choices=["vit", "beit", "deit"])
    parser.add_argument("--fusion_name", type=str,
                        choices=["concat", "attention", "aspect-att", "gmu"])
    parser.add_argument("--seeds", type=str, default="30,40,50",
                        help="comma-separated seeds trained simultaneously")
    parser.add_argument("--nsamples", type=int, default=-1)
    add_common_args(parser, multimodal=True)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    seeds = [int(s) for s in args.seeds.split(",")]
    args.seed = seeds[0]  # data subsampling/shuffle stream
    seed_everything(args.seed, getattr(args, "prng_impl", None), args=args)
    results_dir = results_dir_for(C.results_dir_mm_late, args.testing)
    logger.info("Seed sweep %s: %s-%s %s task %s", seeds, args.txt_model_name,
                args.img_model_name, args.fusion_name, args.task)

    cfg = C.Config(args)
    setup = build_mm_late_setup(args, cfg)

    # re-init one param tree per seed, stacked (imported pretrained towers are
    # identical across seeds in the reference protocol too — only heads and
    # dropout/ITM draws differ; we stack the already-imported tree and re-draw
    # the heads per seed)
    model = setup.model
    pipes = setup.pipes
    sample = next(pipes["train"].batches())
    import jax.numpy as jnp

    def init_fn(key):
        return init_mm_late_params(
            model, key, jnp.asarray(sample["ids"]), jnp.asarray(sample["mask"]),
            jnp.asarray(np.zeros_like(sample["pixel_values"], np.float32)),
            jnp.asarray(sample["token_type_ids"]) if "token_type_ids" in sample else None,
        )

    params_stacked = stack_seed_params(init_fn, seeds)

    def forward_with_norm(p, batch, tim_inputs, dropout_rng, deterministic):
        return setup.forward_fn(p, batch, tim_inputs, dropout_rng, deterministic)

    trainer = EnsembleTrainer(
        forward_with_norm, setup.loss_cfg, setup.tx, params_stacked, seeds,
        class_weights=setup.class_weights, multilabel=cfg.multilabel,
        num_labels=cfg.num_labels, metric_names=C.metric_names,
        log_every=args.log_every,
    )

    loss_str = cfg.loss_str
    nsamples_str = "" if args.nsamples == -1 else "N" + str(args.nsamples) + "_"
    stem_fmt = "{}-{}-{}_task{}_seed{{seed}}_{}_{}".format(
        args.txt_model_name, args.img_model_name, args.fusion_name,
        args.task, loss_str, nsamples_str,
    )
    trainer.fit(
        pipes["train"], pipes["val"], args.epochs, te_pipe=pipes["test"],
        val_filename_fmt=results_dir + stem_fmt + "metrics_val.csv",
        te_filename_fmt=results_dir + stem_fmt + "metrics_test.csv",
    )

    if args.save_preds:
        res = trainer.evaluate(pipes["test"])
        for s in seeds:
            save_predictions_csv(
                {"data_id": res[s]["data_id"], "labels": res[s]["labels"],
                 "predictions": res[s]["predictions"]},
                results_dir + stem_fmt.format(seed=s) + "preds.csv",
            )
    if args.save_model:
        for s in seeds:
            save_params(results_dir + stem_fmt.format(seed=s) + "net.pth",
                        trainer.params_for_seed(s))
    logger.info("Done!")


if __name__ == "__main__":
    main()
