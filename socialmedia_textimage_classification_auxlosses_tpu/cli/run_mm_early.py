"""Early-fusion runner (reference ``models/run_mm_early.py``): ViLT or LXMERT
with the ITC/TIM aux losses; artifact names
``{model}_task{t}_seed{s}_{loss_str}_...`` (reference run_mm_early.py:74-80).

    python -m ....cli.run_mm_early --model vilt --task 3 --epochs 2 --testing
"""

from __future__ import annotations

import argparse

from ..core import config as C
from ..train.checkpoint import TrainCheckpointer
from ..train.loop import Trainer
from ..train.metrics import compute_metrics
from ..utils.logging import get_logger
from ._build_early import build_mm_early_setup
from ._common import (add_common_args, artifact_stem, results_dir_for,
                      save_metrics_csv, save_predictions_csv,
                      seed_everything)

logger = get_logger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="run early fusion models")
    parser.add_argument("--model", type=str,
                        choices=["vilt", "lxmert", "mmbt"],
                        help="model name (mmbt: the reference declares its "
                             "dataset + results dir but ships no model — "
                             "completed per the paper, models/mmbt.py)")
    parser.add_argument("--evaltest", action="store_true", help="eval test")
    parser.add_argument("--import_reference_ckpt", type=str, default=None,
                        help="path to a reference-trained ViLT/Lxmert wrapper "
                             ".pth state dict to import")
    parser.add_argument("--vilt_exact_resize", action="store_true",
                        help="(--model vilt) HF ViltProcessor preprocessing "
                             "semantics: per-sample aspect-preserving resize "
                             "(shortest edge 384, longer capped, /32 floor) "
                             "onto a fixed masked canvas + per-sample "
                             "position-grid interpolation — the reference's "
                             "pad_and_create_pixel_mask collate "
                             "(mm_early.py:205-226) with static XLA shapes. "
                             "Default mode resizes to a fixed square "
                             "(faster: 145 image tokens vs 362; delta "
                             "quantified in tests/test_vilt_exact.py)")
    parser.add_argument("--tim_two_pass", action="store_true",
                        help="run the TIM pass as the reference's second "
                             "sequential backbone pass (mm_early.py:78-92) "
                             "instead of the default batched 2B-row dispatch; "
                             "identical math either way — only the training "
                             "dropout stream differs (one draw over 2B rows "
                             "vs two draws over B)")
    add_common_args(parser, multimodal=True)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    seed_everything(args.seed, getattr(args, "prng_impl", None), args=args)
    model_name = args.model
    # MMBT artifacts land in the reference's dedicated directory
    # (results_dir_mmbt, reference config.py:135)
    results_dir = results_dir_for(
        C.results_dir_mmbt if model_name == "mmbt" else C.results_dir_mm_early,
        args.testing)
    logger.info(
        "Model: %s, Task: %s, Epochs: %s, ITC loss: %s, TIM loss: %s, "
        "beta_itc: %s, beta_itm: %s, seed: %s",
        model_name, args.task, args.epochs, args.use_clip_loss,
        args.use_tim_loss, args.beta_itc, args.beta_itm, args.seed,
    )

    cfg = C.Config(args, model_name=model_name)
    setup = build_mm_early_setup(args, cfg)

    if args.import_reference_ckpt:
        if model_name == "mmbt":
            raise SystemExit("--import_reference_ckpt: the reference ships "
                             "no MMBT model, so no reference checkpoint "
                             "format exists for it")
        from ..models import hf_import as Himp

        state = Himp.load_torch_file(args.import_reference_ckpt)
        if state is not None:
            if model_name == "vilt":
                tree = Himp.import_reference_vilt(state, setup.model.cfg.layers)
            else:
                lx = setup.model.cfg
                tree = Himp.import_reference_lxmert(state, lx.l_layers,
                                                    lx.r_layers, lx.x_layers)
            merged = Himp.merge_tower({"root": setup.params["params"]}, tree,
                                      path=("root",))
            setup.params = {"params": merged["root"]}
            setup.opt_state = setup.tx.init(setup.params)
            logger.info("imported reference checkpoint %s",
                        args.import_reference_ckpt)

    stem = artifact_stem(args, cfg, model_name)
    model_path = results_dir + stem + "net.pth" if args.save_model else None
    val_filename = results_dir + stem + "metrics_val.csv"
    te_filename = results_dir + stem + "metrics_test.csv"

    ckpt = (TrainCheckpointer(results_dir + stem + "ckpt", args.ckpt_every)
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

    logger.info("Training...")
    trainer.fit(
        setup.pipes["train"], setup.pipes["val"], args.epochs,
        te_pipe=setup.pipes["test"], val_filename=val_filename,
        te_filename=te_filename, model_path=model_path,
    )

    if args.evaltest:
        logger.info("Evaluate and compute metrics")
        predictions = trainer.evaluate(setup.pipes["test"])
        metrics = compute_metrics(predictions, cfg.num_labels,
                                  multilabel=cfg.multilabel)
        print(metrics)
        if not args.testing:
            save_predictions_csv(predictions, results_dir + stem + "preds.csv")
            save_metrics_csv(metrics, results_dir + stem + "metrics.csv")
    logger.info("Done!")


if __name__ == "__main__":
    main()
