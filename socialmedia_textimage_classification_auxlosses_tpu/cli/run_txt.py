"""Text-only runner (reference ``models/run_txt.py``): same flags, same
artifact names (``{model}_task{t}_seed{s}_metrics_{val,test}.csv``,
``..._preds.csv``, ``..._net.pth`` — reference run_txt.py:56-101), compiled
TPU train/eval path underneath.

    python -m socialmedia_textimage_classification_auxlosses_tpu.cli.run_txt \
        --model_name bert --task 3 --epochs 2 --seed 30 --testing
"""

from __future__ import annotations

import argparse

from ..core import config as C
from ..train.checkpoint import TrainCheckpointer
from ..train.loop import Trainer
from ..train.metrics import compute_metrics
from ..utils.logging import get_logger
from ._build import build_text_setup
from ._common import (add_common_args, results_dir_for, save_metrics_csv,
                      save_predictions_csv, seed_everything, seq_buckets_from)

logger = get_logger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="run text-only models")
    parser.add_argument("--model_name", type=str,
                        choices=["bert", "bernice", "bertweet", "roberta"],
                        help="model name")
    parser.add_argument("--eval_txt_test", action="store_true", help="eval txt test")
    parser.add_argument("--freeze", action="store_true", help="freeze the tower")
    add_common_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    seed_everything(args.seed, getattr(args, "prng_impl", None), args=args)
    results_dir = results_dir_for(C.results_dir_txt, args.testing)
    logger.info("Model: %s, Task: %s, Epochs: %s, LC:%s, seed: %s",
                args.model_name, args.task, args.epochs,
                args.use_loss_correction, args.seed)

    cfg = C.Config(args, multimodal=False, txt=True)
    cfg.use_loss_correction = args.use_loss_correction
    setup = build_text_setup(args, cfg, freeze=args.freeze)

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

    if args.save_preds:
        predictions = trainer.evaluate(setup.pipes["test"])
        path = results_dir + stem + "_preds.csv"
        save_predictions_csv(predictions, path)
        logger.info("%s saved", path)

    if args.eval_txt_test:
        # text-only MIC eval set (reference run_txt.py:80-101)
        from ..data.pipeline import PipelineConfig, SplitPipeline
        from ..data.prep import prepare_text_data

        txt_test = prepare_text_data(C.TDATA5, num_labels=cfg.num_labels,
                                     testing=args.testing)
        pipe = SplitPipeline(
            txt_test,
            PipelineConfig(batch_size=cfg.batch_size, max_length=cfg.max_length,
                           with_images=False,
                           seq_buckets=seq_buckets_from(args)),
            tokenizer=setup.tokenizer,
        )
        predictions = trainer.evaluate(pipe)
        metrics = compute_metrics(predictions, cfg.num_labels)
        save_predictions_csv(predictions, results_dir + stem + "_preds_txt.csv")
        save_metrics_csv(metrics, results_dir + stem + "_metrics_txt.csv")

    logger.info("Done!")


if __name__ == "__main__":
    main()
