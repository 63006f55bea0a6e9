"""Image-only runner (reference ``models/run_img.py``): ViT/BEiT/DEiT and
ResNet-50/152 (+``--conv_att`` attention-CNN, ``--feature_extract`` frozen
trunk), same flags/artifact names, compiled TPU path.

    python -m socialmedia_textimage_classification_auxlosses_tpu.cli.run_img \
        --model_name vit --task 6 --epochs 2 --testing
"""

from __future__ import annotations

import argparse

from ..core import config as C
from ..train.checkpoint import TrainCheckpointer
from ..train.loop import Trainer
from ..utils.logging import get_logger
from ._build import build_image_setup
from ._common import (add_common_args, results_dir_for, save_predictions_csv,
                      seed_everything)

logger = get_logger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="run image-only models")
    parser.add_argument("--model_name", type=str,
                        choices=["vit", "beit", "deit", "resnet50", "resnet152"],
                        help="model name")
    parser.add_argument("--conv_att", action="store_true", help="CNN ATT")
    parser.add_argument("--feature_extract", action="store_true",
                        help="freeze the conv trunk")
    parser.add_argument("--use_saved_features", action="store_true",
                        help="use preprocessed features")
    add_common_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    seed_everything(args.seed, getattr(args, "prng_impl", None), args=args)
    results_dir = results_dir_for(C.results_dir_img, args.testing)
    logger.info("Model: %s, Task: %s, feature extract: %s, conv att: %s, "
                "Epochs: %s, seed: %s", args.model_name, args.task,
                args.feature_extract, args.conv_att, args.epochs, args.seed)

    cfg = C.Config(args, multimodal=False)
    setup = build_image_setup(args, cfg)

    stem = f"{args.model_name}_task{args.task}_seed{args.seed}"
    model_path = results_dir + stem + "_net.pth" if args.save_model else None
    val_filename = results_dir + stem + "_metrics_val.csv"
    te_filename = results_dir + stem + "_metrics_test.csv"

    ckpt = (TrainCheckpointer(results_dir + stem + "_ckpt", args.ckpt_every)
            if args.ckpt_every else None)
    trainer = Trainer(
        setup.train_step, setup.eval_step, setup.params, setup.opt_state,
        seed=args.seed, mesh_plan=setup.mesh_plan, checkpointer=ckpt,
        multilabel=cfg.multilabel, num_labels=cfg.num_labels,
        metric_names=C.metric_names, log_every=args.log_every,
        profile_dir=args.profile, log_jsonl=args.log_jsonl,
        resume=args.resume, train_many=setup.train_many,
        eval_many=setup.eval_many,
        steps_per_dispatch=args.steps_per_dispatch,
    )

    logger.info("Training")
    trainer.fit(
        setup.pipes["train"], setup.pipes["val"], args.epochs,
        te_pipe=setup.pipes["test"], val_filename=val_filename,
        te_filename=te_filename, model_path=model_path,
    )
    logger.info("%s saved!", val_filename)

    if args.save_preds:
        logger.info("Evaluate and compute metrics")
        predictions = trainer.evaluate(setup.pipes["test"])
        path = results_dir + stem + "_preds.csv"
        save_predictions_csv(predictions, path)
        logger.info("%s saved", path)
    logger.info("Done!")


if __name__ == "__main__":
    main()
