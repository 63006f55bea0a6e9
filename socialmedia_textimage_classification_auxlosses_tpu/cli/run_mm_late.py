"""Late-fusion multimodal runner — the paper's headline path (reference
``models/run_mm_late.py``). Full flag surface preserved: txt/img model
choice, 6 fusion names, aux-loss flags & betas, ``--nsamples``,
``--use_saved_features``, ``--save_model``/``--load_saved_model``,
``--eval_txt_test``, ``--save_preds``; artifact naming
``{txt}-{img}-{fusion}_task{t}_seed{s}_{loss_str}_{N}...`` (reference
run_mm_late.py:91-96).

    python -m ....cli.run_mm_late --txt_model_name bernice \
        --img_model_name vit --fusion_name attention --task 2 \
        --epochs 7 --seed 40 --use_clip_loss --use_tim_loss --testing
"""

from __future__ import annotations

import argparse

from ..core import config as C
from ..train.checkpoint import TrainCheckpointer, load_params
from ..train.loop import Trainer
from ..train.metrics import compute_metrics
from ..utils.logging import get_logger
from ._build import build_mm_late_setup
from ._common import (add_common_args, artifact_stem, results_dir_for,
                      save_metrics_csv, save_predictions_csv,
                      seed_everything, seq_buckets_from)

logger = get_logger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="run late fusion models")
    parser.add_argument("--txt_model_name", type=str,
                        choices=["bert", "bernice", "bertweet", "roberta"],
                        help="model name")
    parser.add_argument("--img_model_name", type=str,
                        choices=["vit", "beit", "deit", "resnet50", "resnet152"],
                        help="model name")
    parser.add_argument("--fusion_name", type=str,
                        choices=["xatt", "concat", "attention", "concat_cnn",
                                 "aspect-att", "gmu"],
                        help="fusion method")
    parser.add_argument("--use_iadds_loss", action="store_true",
                        help="use image-adds loss")
    parser.add_argument("--beta_iadds", type=float, default=0.1,
                        help="hyperparameter for iadds loss")
    parser.add_argument("--nsamples", type=int, default=-1,
                        help="number of training samples")
    parser.add_argument("--eval_txt_test", action="store_true", help="eval txt test")
    parser.add_argument("--load_saved_model", action="store_true",
                        help="load saved model")
    parser.add_argument("--quantize", type=str, default=None, choices=["w8"],
                        help="(with --load_saved_model) serve with "
                             "weight-only int8 kernels (w8a16 PTQ, "
                             "ops/quant.py): halves weight HBM streaming "
                             "on the bandwidth-bound eval step; logit "
                             "closeness bounded in tests/test_quant.py")
    parser.add_argument("--import_reference_ckpt", type=str, default=None,
                        help="path to a reference-trained MM_Model .pth "
                             "state dict to import (torch.save format)")
    parser.add_argument("--extract_features", action="store_true",
                        help="dump fused mm_features for the test split "
                             "(reference MMLate_Model.extract_features, "
                             "mm_late.py:703-739)")
    add_common_args(parser, multimodal=True)
    args = parser.parse_args(argv)
    if args.img_model_name in ("resnet50", "resnet152") and (
            args.use_clip_loss or args.use_tim_loss):
        # MMCnnModel has no dual-encoder projections, so there are no
        # logits_per_text / out_tim outputs to build ITC/ITM on (the
        # reference likewise cannot run this combination — its CNN-fusion
        # registry names are undefined, mm_late.py:42-47). Fail here with a
        # clear message instead of a KeyError inside the jitted loss.
        parser.error("--use_clip_loss/--use_tim_loss require a transformer "
                     "image tower (vit/beit/deit); the CNN fusion model has "
                     "no image-text projection heads")
    return args


def main(argv=None):
    args = parse_args(argv)
    seed_everything(args.seed, getattr(args, "prng_impl", None), args=args)
    results_dir = results_dir_for(C.results_dir_mm_late, args.testing)
    logger.info(
        "Model: %s-%s, Task: %s, Fusion: %s, Testing: %s, PP Features: %s, "
        "ITC Loss: %s, TIM Loss: %s, beta_itc: %s, beta_itm: %s, NSamples: %s, "
        "seed: %s",
        args.txt_model_name, args.img_model_name, args.task, args.fusion_name,
        args.testing, args.use_saved_features, args.use_clip_loss,
        args.use_tim_loss, args.beta_itc, args.beta_itm, args.nsamples, args.seed,
    )

    cfg = C.Config(args)
    cfg.use_iadds_loss = args.use_iadds_loss
    cfg.beta_iadds = args.beta_iadds if args.use_iadds_loss else None
    setup = build_mm_late_setup(args, cfg)

    if args.import_reference_ckpt:
        from ..models import hf_import as Himp

        setup.params = Himp.maybe_import_reference_mm_late(
            setup.params, args.import_reference_ckpt,
            setup.model.text_cfg.layers, setup.model.vision_cfg.layers,
            args.fusion_name,
        )
        setup.opt_state = setup.tx.init(setup.params)
        logger.info("imported reference checkpoint %s", args.import_reference_ckpt)

    if args.cache_vision:
        if args.img_model_name in ("resnet50", "resnet152"):
            logger.warning("--cache_vision requires a (frozen) transformer "
                           "vision tower; ignoring for the CNN path")
        else:
            from ._build import enable_vision_cache

            enable_vision_cache(setup)

    stem = artifact_stem(args, cfg, "mm_late")
    model_path = (results_dir + stem + "net.pth"
                  if (args.save_model or args.load_saved_model) else None)
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

    if not args.load_saved_model:
        logger.info("Training")
        trainer.fit(
            setup.pipes["train"], setup.pipes["val"], args.epochs,
            te_pipe=setup.pipes["test"], val_filename=val_filename,
            te_filename=te_filename, model_path=model_path,
        )

        if args.save_preds:
            predictions = trainer.evaluate(setup.pipes["test"])
            path = results_dir + stem + "preds.csv"
            save_predictions_csv(predictions, path)
            logger.info("%s saved", path)
        if args.extract_features:
            import numpy as np

            res = trainer.evaluate(setup.pipes["test"], collect_features=True,
                                   feature_step=setup.feature_step)
            np.savez(results_dir + stem + "features.npz",
                     features=res["features"], labels=res["labels"],
                     data_id=res["data_id"])
            logger.info("%s saved", results_dir + stem + "features.npz")
        if args.eval_txt_test:
            logger.info("Evaluate and compute metrics (txt test)")
            predictions = trainer.evaluate(_txt_test_pipe(args, cfg, setup))
            metrics = compute_metrics(predictions, cfg.num_labels)
            save_predictions_csv(predictions, results_dir + stem + "preds_txt.csv")
            save_metrics_csv(metrics, results_dir + stem + "metrics_txt.csv")
    else:
        # load-and-eval path (reference run_mm_late.py:155-185)
        trainer.params = load_params(model_path, setup.params)
        logger.info("model loaded")
        if args.quantize == "w8":
            from ..ops.quant import (make_quantized_eval_forward,
                                     quantize_w8)
            from ..train.steps import make_eval_many, make_eval_step

            qfwd = make_quantized_eval_forward(setup.forward_fn)
            trainer.params = quantize_w8(trainer.params)
            trainer.eval_step = make_eval_step(qfwd, setup.loss_cfg,
                                               setup.class_weights)
            trainer.eval_many = make_eval_many(qfwd, setup.loss_cfg,
                                               setup.class_weights)
            logger.info("w8 serving quantization enabled")
        else:
            # eval-only bf16 parameter pre-cast: bitwise-exact halving of the
            # eval step's weight HBM streaming (utils/cast.py,
            # tests/test_eval_cast.py)
            from ..utils.cast import cast_params_for_eval

            trainer.params = cast_params_for_eval(trainer.params, args.dtype)
        predictions = trainer.evaluate(setup.pipes["test"])
        save_predictions_csv(predictions, results_dir + stem + "preds_lm.csv")
        metrics = compute_metrics(predictions, cfg.num_labels,
                                  multilabel=cfg.multilabel)
        save_metrics_csv(metrics, results_dir + stem + "metrics_lm.csv")
        logger.info("%s saved", results_dir + stem + "metrics_lm.csv")

    logger.info("Done!")


def _txt_test_pipe(args, cfg, setup):
    """MIC text-only eval with the empty image (reference mm_late.py:372-379)."""
    from ..data.pipeline import PipelineConfig, SplitPipeline, make_image_source
    from ..data.prep import prepare_text_data

    txt_test = prepare_text_data(C.TDATA5, num_labels=cfg.num_labels,
                                 testing=args.testing)
    src = make_image_source(C.EMPTY_IMG, ids=txt_test.ids,
                            size=setup.pipes["test"].cfg.image_size,
                            empty_image=C.EMPTY_IMG)
    return SplitPipeline(
        txt_test,
        PipelineConfig(batch_size=cfg.batch_size, max_length=cfg.max_length,
                       image_size=setup.pipes["test"].cfg.image_size,
                       seq_buckets=seq_buckets_from(args)),
        tokenizer=setup.tokenizer, image_source=src,
    )


if __name__ == "__main__":
    main()
