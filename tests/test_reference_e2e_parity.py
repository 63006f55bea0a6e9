"""End-to-end TRAINING parity against the reference snapshot (round-1
verdict item 8): identical tiny checkpoint + identical fixture data +
identical (transplanted) head init + shuffle off + dropout 0 ->
per-step train-loss trajectories and eval outputs must match between the
reference's own torch train loop (text_only.py, run via tests/ref_harness)
and our compiled train step.

This upgrades component-level parity (losses/towers/metrics bit-tests)
to training parity: the strongest claim available without the real
datasets (reference run_mm_late.py:65-153 contract).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from fixtures import make_task_fixture, patch_task  # noqa: E402

N_ROWS = 32          # 24 train (16+8: exercises our padded last batch), 4/4
EPOCHS = 1
LR, WD = 1e-3, 2.5e-4

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "tweet", "number",
         "with", "and", "a", "link", "httpurl", "@user", "user", "@", "!",
         "1", "2", "3", "4", "5", "6", "7", "8", "9", "0", "##0", "##1",
         "##2", "##3", "##4", "##5", "##6", "##7", "##8", "##9"]


def _make_ckpt(tmp_path):
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    vfile = tmp_path / "vocab.txt"
    vfile.write_text("\n".join(VOCAB) + "\n")
    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=130, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    bert = BertModel(cfg)
    ckpt = tmp_path / "bert_ckpt"
    bert.save_pretrained(str(ckpt), safe_serialization=False)
    BertTokenizer(str(vfile), do_lower_case=True).save_pretrained(str(ckpt))
    return str(ckpt)


@pytest.fixture
def parity_env(tmp_path):
    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3,
                                              n=N_ROWS)
    ckpt = _make_ckpt(tmp_path)
    res = tmp_path / "ref_results"
    res.mkdir()
    return dict(csv=csv_path, img_fmt=img_fmt, ckpt=ckpt, res=str(res))


def _run_reference(env):
    """Drive the reference's own TextModel.train deterministically."""
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader

    from ref_harness import load_reference

    mods = load_reference({
        "PATH": {3: env["csv"]},
        "IMG_FMT": {3: env["img_fmt"]},
        "MODEL_DIR_DICT": {"bert": env["ckpt"]},
        "txt_feat_size": 32,  # module constant is hardcoded 768 (config.py:82)
        "results_dir_txt": env["res"] + "/",
    })
    to = mods["text_only"]
    Config = mods["config"].Config

    class Args:
        task = 3
        dropout = 0.0
        weight_decay = WD
        lr = LR
        use_loss_correction = False

    torch.manual_seed(30)
    cfg = Config(Args(), multimodal=False, txt=True)
    tm = to.TextModel(cfg, "bert")
    tr_l, va_l, te_l, weight, _ = tm.load_data(cfg.data, testing=False,
                                               task_name=cfg.task_name)
    # deterministic order for the trajectory comparison
    tr_l = DataLoader(tr_l.dataset, batch_size=cfg.batch_size, shuffle=False)

    losses = []
    base_fn = nn.CrossEntropyLoss(weight=weight)

    class Recorder(nn.Module):
        def forward(self, out, target):
            l = base_fn(out, target)
            losses.append(float(l.detach()))
            return l

    # capture the torch head's INITIAL weights (to transplant into ours)
    head0_w = tm.model.linear.weight.detach().numpy().copy()
    head0_b = tm.model.linear.bias.detach().numpy().copy()

    val_csv = env["res"] + "/ref_metrics_val.csv"
    tm.train(tr_l, va_l, EPOCHS, Recorder(), LR, WD, val_filename=val_csv)
    return {
        "losses": losses,  # train steps then val batches, per epoch
        "val_csv": val_csv,
        "head0_w": head0_w,
        "head0_b": head0_b,
        "n_train_batches": len(tr_l),
    }


def test_text_training_parity_vs_reference(parity_env, monkeypatch):
    import jax
    import jax.numpy as jnp
    import pandas as pd

    ref = _run_reference(parity_env)
    n_tr = ref["n_train_batches"]
    ref_train = ref["losses"][:n_tr]
    ref_val = ref["losses"][n_tr:n_tr + 1]  # 4 val rows -> 1 batch

    # ---- ours ---------------------------------------------------------
    from socialmedia_textimage_classification_auxlosses_tpu.core import (
        config as C,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_txt
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build import (
        build_text_setup,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.loop import (
        Trainer,
    )

    patch_task(monkeypatch, C, 3, parity_env["csv"], parity_env["img_fmt"],
               parity_env["res"] + "/ours")
    monkeypatch.setitem(C.MODEL_DIR_DICT, "bert", parity_env["ckpt"])

    args = run_txt.parse_args([
        "--model_name", "bert", "--task", "3", "--dtype", "float32",
        "--attn_impl", "jnp", "--dropout", "0.0", "--lr", str(LR),
        "--weight_decay", str(WD), "--epochs", str(EPOCHS),
    ])
    cfg = C.Config(args, multimodal=False)
    setup = build_text_setup(args, cfg)

    # identical head init: transplant the reference head's initial weights
    p = jax.tree_util.tree_map(lambda x: x, setup.params)
    p["params"]["classifier"] = {
        "kernel": jnp.asarray(ref["head0_w"].T),
        "bias": jnp.asarray(ref["head0_b"]),
    }
    opt_state = setup.tx.init(p)

    our_train = []
    params = p
    for batch in setup.pipes["train"].device_iter(shuffle=False):
        key = jax.random.fold_in(jax.random.PRNGKey(0), len(our_train))
        params, opt_state, metrics = setup.train_step(params, opt_state,
                                                      batch, key)
        our_train.append(float(metrics["loss"]))

    trainer = Trainer(setup.train_step, setup.eval_step, params, opt_state,
                      num_labels=cfg.num_labels,
                      metric_names=C.metric_names)
    res_val = trainer.evaluate(setup.pipes["val"])

    # ---- compare ------------------------------------------------------
    np.testing.assert_allclose(our_train, ref_train, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(res_val["loss"], ref_val[0], rtol=2e-3,
                               atol=2e-4)
    # metric CSV parity: macro F1 row of the reference's own CSV
    ref_df = pd.read_csv(ref["val_csv"]).set_index("metric")
    from socialmedia_textimage_classification_auxlosses_tpu.train.metrics import (
        metrics_from_confusion,
    )
    ours_m = metrics_from_confusion(res_val["cm"])
    np.testing.assert_allclose(ours_m["f1_macro"],
                               float(ref_df.loc["f1_macro", "epoch-1"]),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Image-only (run_img / image_only.py ImageModel): ViT fine-tune parity


def _run_reference_img(env, vit_ckpt):
    """Drive the reference's own ImageModel.train deterministically
    (reference image_only.py:179-230; its DataLoaders ship unshuffled)."""
    import torch
    import torch.nn as nn

    from ref_harness import load_reference

    mods = load_reference({
        "PATH": {3: env["csv"]},
        "IMG_FMT": {3: env["img_fmt"]},
        "MODEL_DIR_DICT": {"vit": vit_ckpt},
        "results_dir_img": env["res"] + "/",
    })
    io = mods["image_only"]
    Config = mods["config"].Config

    class Args:
        task = 3
        dropout = 0.0
        weight_decay = WD
        lr = LR
        use_loss_correction = False

    torch.manual_seed(30)
    cfg = Config(Args(), multimodal=False)
    im = io.ImageModel(cfg.batch_size, cfg.num_labels, "vit")
    tr_l, va_l, te_l, weight = im.load_data(cfg.data, cfg.img_fmt,
                                            testing=False,
                                            task_name=cfg.task_name)
    losses = []
    base_fn = nn.CrossEntropyLoss(weight=weight)

    class Recorder(nn.Module):
        def forward(self, out, target):
            l = base_fn(out, target)
            losses.append(float(l.detach()))
            return l

    head0_w = im.model.classifier.weight.detach().numpy().copy()
    head0_b = im.model.classifier.bias.detach().numpy().copy()
    im.train(tr_l, va_l, EPOCHS, Recorder(), LR, WD,
             val_filename=env["res"] + "/ref_img_val.csv")
    return {"losses": losses, "head0_w": head0_w, "head0_b": head0_b,
            "n_train_batches": len(tr_l)}


def test_image_training_parity_vs_reference(tmp_path, monkeypatch):
    """run_img (ViT fine-tune): per-step train losses match the reference's
    torch loop under identical init/data (image_only.py:179-230)."""
    import jax
    import jax.numpy as jnp

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3,
                                              n=N_ROWS)
    vit_ckpt = _make_vit_ckpt(tmp_path)
    res = tmp_path / "res"
    res.mkdir()
    env = dict(csv=str(csv_path), img_fmt=img_fmt, res=str(res))
    ref = _run_reference_img(env, vit_ckpt)
    n_tr = ref["n_train_batches"]

    from socialmedia_textimage_classification_auxlosses_tpu.core import (
        config as C,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli import run_img
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build import (
        build_image_setup,
    )

    patch_task(monkeypatch, C, 3, env["csv"], env["img_fmt"],
               str(res) + "/ours")
    monkeypatch.setitem(C.MODEL_DIR_DICT, "vit", vit_ckpt)

    args = run_img.parse_args([
        "--model_name", "vit", "--task", "3", "--dtype", "float32",
        "--attn_impl", "jnp", "--dropout", "0.0", "--lr", str(LR),
        "--weight_decay", str(WD), "--epochs", str(EPOCHS),
    ])
    cfg = C.Config(args, multimodal=False)
    setup = build_image_setup(args, cfg)

    p = jax.tree_util.tree_map(lambda x: x, setup.params)
    p["params"]["classifier"] = {
        "kernel": jnp.asarray(ref["head0_w"].T),
        "bias": jnp.asarray(ref["head0_b"]),
    }
    opt_state = setup.tx.init(p)

    our_train = []
    params = p
    for batch in setup.pipes["train"].device_iter(shuffle=False):
        key = jax.random.fold_in(jax.random.PRNGKey(0), len(our_train))
        params, opt_state, metrics = setup.train_step(params, opt_state,
                                                      batch, key)
        our_train.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_train, ref["losses"][:n_tr], rtol=2e-3,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# MM late fusion (the paper's flagship path): CE + ITC training parity
# ---------------------------------------------------------------------------


def _make_vit_ckpt(tmp_path):
    import torch
    from transformers import ViTConfig, ViTModel, ViTFeatureExtractor

    torch.manual_seed(1)
    cfg = ViTConfig(hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    image_size=32, patch_size=16,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    vit = ViTModel(cfg)
    ckpt = tmp_path / "vit_ckpt"
    vit.save_pretrained(str(ckpt), safe_serialization=False)
    ViTFeatureExtractor(size=32).save_pretrained(str(ckpt))
    return str(ckpt)


def _fixed_tim_pattern(step: int, b: int):
    """Deterministic swap pattern injected into BOTH loops: odd rows
    mismatch, partner offset rotates with the step (never self)."""
    lbl = np.asarray([1 if i % 2 == 0 else 0 for i in range(b)], np.int64)
    off = 1 + (step % max(b - 1, 1))
    src = np.asarray([i if lbl[i] else (i + off) % b for i in range(b)],
                     np.int64)
    return src, lbl


def _run_reference_mm(env, vit_ckpt, tmp_path, use_tim=False):
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader

    from ref_harness import load_reference

    mods = load_reference({
        "PATH": {3: env["csv"]},
        "IMG_FMT": {3: env["img_fmt"]},
        "MODEL_DIR_DICT": {"bert": env["ckpt"], "vit": vit_ckpt},
        "txt_feat_size": 32, "img_feat_size": 32, "fixed_feat_size": 32,
        "results_dir_mm_late": env["res"] + "/",
    })
    ml = mods["mm_late"]
    Config = mods["config"].Config

    class Args:
        task = 3
        dropout = 0.0
        weight_decay = WD
        lr = LR
        use_loss_correction = False
        use_clip_loss = True
        beta_itc = 0.1
        use_tim_loss = use_tim
        beta_itm = 0.1
        use_iadds_loss = False
        beta_iadds = None

    torch.manual_seed(30)
    cfg = Config(Args(), multimodal=True)
    mm = ml.MMLate_Model(cfg, "bert", "vit", "attention")
    tr_l, va_l, te_l, weight, _ = mm.load_data(cfg.data, cfg.img_fmt,
                                               task_name=cfg.task_name)
    tr_l = DataLoader(tr_l.dataset, batch_size=cfg.batch_size, shuffle=False)

    # save the INITIAL torch state dict for import into our params
    init_sd = {k: v.clone() for k, v in mm.model.state_dict().items()}
    sd_path = str(tmp_path / "mm_init.pth")
    torch.save(init_sd, sd_path)

    ce_losses, itc_losses, itm_losses = [], [], []
    base_fn = nn.CrossEntropyLoss(weight=weight)

    class CeRecorder(nn.Module):
        def forward(self, out, target):
            l = base_fn(out, target)
            ce_losses.append(float(l.detach()))
            return l

    tim_base = nn.CrossEntropyLoss()

    class TimRecorder(nn.Module):
        def forward(self, out, target):
            l = tim_base(out, target)
            itm_losses.append(float(l.detach()))
            return l

    if use_tim:
        # pin the host-RNG negative sampling (mm_late.py:389-414) to the
        # shared fixed pattern so trajectories are comparable
        counter = {"n": 0}

        def fixed_itm(ids, mask):
            src, lbl = _fixed_tim_pattern(counter["n"], ids.shape[0])
            counter["n"] += 1
            return (ids[src], mask[src],
                    torch.tensor(lbl, dtype=torch.long))

        mm.prepare_itm_inputs = fixed_itm

    orig_clip = ml.clip_loss

    def clip_recorder(logits):
        l = orig_clip(logits)
        itc_losses.append(float(l.detach()))
        return l

    ml.clip_loss = clip_recorder
    try:
        val_csv = env["res"] + "/ref_mm_metrics_val.csv"
        mm.train(tr_l, va_l, EPOCHS, CeRecorder(), LR, WD,
                 tim_loss_fn=TimRecorder() if use_tim else None,
                 val_filename=val_csv)
    finally:
        ml.clip_loss = orig_clip
    return {"ce": ce_losses, "itc": itc_losses, "itm": itm_losses,
            "sd_path": sd_path, "n_train_batches": len(tr_l)}


def test_mm_late_training_parity_vs_reference(tmp_path, monkeypatch):
    """Flagship (Bernice-config dual encoder at tiny scale: bert+vit,
    attention fusion, CE + beta_itc*ITC, frozen vision): per-step CE and ITC
    loss components match the reference's torch loop."""
    import jax
    import jax.numpy as jnp

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3,
                                              n=24)  # 16 train: 1 full batch
    ckpt = _make_ckpt(tmp_path)
    vit_ckpt = _make_vit_ckpt(tmp_path)
    res = tmp_path / "res"
    res.mkdir()
    env = dict(csv=str(csv_path), img_fmt=img_fmt, ckpt=ckpt, res=str(res))
    ref = _run_reference_mm(env, vit_ckpt, tmp_path)
    n_tr = ref["n_train_batches"]

    from socialmedia_textimage_classification_auxlosses_tpu.core import (
        config as C,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli import (
        run_mm_late,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build import (
        build_mm_late_setup,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.models import (
        hf_import as H,
    )

    patch_task(monkeypatch, C, 3, env["csv"], env["img_fmt"],
               str(res) + "/ours")
    monkeypatch.setitem(C.MODEL_DIR_DICT, "bert", ckpt)
    monkeypatch.setitem(C.MODEL_DIR_DICT, "vit", vit_ckpt)

    args = run_mm_late.parse_args([
        "--txt_model_name", "bert", "--img_model_name", "vit",
        "--fusion_name", "attention", "--task", "3", "--dtype", "float32",
        "--attn_impl", "jnp", "--dropout", "0.0", "--lr", str(LR),
        "--weight_decay", str(WD), "--epochs", str(EPOCHS),
        "--use_clip_loss",
    ])
    cfg = C.Config(args)
    setup = build_mm_late_setup(args, cfg)
    params = H.maybe_import_reference_mm_late(setup.params, ref["sd_path"],
                                              2, 2, "attention")
    opt_state = setup.tx.init(params)

    our_ce, our_itc = [], []
    for batch in setup.pipes["train"].device_iter(shuffle=False):
        key = jax.random.fold_in(jax.random.PRNGKey(0), len(our_ce))
        params, opt_state, m = setup.train_step(params, opt_state, batch, key)
        our_ce.append(float(m["cls_loss"]))
        our_itc.append(float(m["itc_loss"]))

    np.testing.assert_allclose(our_ce, ref["ce"][:n_tr], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_itc, ref["itc"][:n_tr], rtol=2e-3,
                               atol=2e-4)


def test_mm_late_tim_training_parity_vs_reference(tmp_path, monkeypatch):
    """Full headline loss (CE + beta_itc*ITC + beta_itm*ITM): per-step CE,
    ITC AND ITM components match the reference's torch loop with the
    negative-sampling pattern pinned on both sides (the reference samples on
    the host, mm_late.py:389-414; ours injects the same pattern through the
    batch's ``tim_src``/``tim_labels`` hook)."""
    import jax
    import jax.numpy as jnp

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3,
                                              n=24)
    ckpt = _make_ckpt(tmp_path)
    vit_ckpt = _make_vit_ckpt(tmp_path)
    res = tmp_path / "res"
    res.mkdir()
    env = dict(csv=str(csv_path), img_fmt=img_fmt, ckpt=ckpt, res=str(res))
    ref = _run_reference_mm(env, vit_ckpt, tmp_path, use_tim=True)
    n_tr = ref["n_train_batches"]

    from socialmedia_textimage_classification_auxlosses_tpu.core import (
        config as C,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli import (
        run_mm_late,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build import (
        build_mm_late_setup,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.models import (
        hf_import as H,
    )

    patch_task(monkeypatch, C, 3, env["csv"], env["img_fmt"],
               str(res) + "/ours")
    monkeypatch.setitem(C.MODEL_DIR_DICT, "bert", ckpt)
    monkeypatch.setitem(C.MODEL_DIR_DICT, "vit", vit_ckpt)

    args = run_mm_late.parse_args([
        "--txt_model_name", "bert", "--img_model_name", "vit",
        "--fusion_name", "attention", "--task", "3", "--dtype", "float32",
        "--attn_impl", "jnp", "--dropout", "0.0", "--lr", str(LR),
        "--weight_decay", str(WD), "--epochs", str(EPOCHS),
        "--use_clip_loss", "--use_tim_loss",
    ])
    cfg = C.Config(args)
    setup = build_mm_late_setup(args, cfg)
    params = H.maybe_import_reference_mm_late(setup.params, ref["sd_path"],
                                              2, 2, "attention")
    opt_state = setup.tx.init(params)

    our_ce, our_itc, our_itm = [], [], []
    for batch in setup.pipes["train"].device_iter(shuffle=False):
        src, lbl = _fixed_tim_pattern(len(our_ce), int(batch["ids"].shape[0]))
        batch = dict(batch)
        batch["tim_src"] = jnp.asarray(src)
        batch["tim_labels"] = jnp.asarray(lbl)
        key = jax.random.fold_in(jax.random.PRNGKey(0), len(our_ce))
        params, opt_state, m = setup.train_step(params, opt_state, batch, key)
        our_ce.append(float(m["cls_loss"]))
        our_itc.append(float(m["itc_loss"]))
        our_itm.append(float(m["itm_loss"]))

    np.testing.assert_allclose(our_ce, ref["ce"][:n_tr], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_itc, ref["itc"][:n_tr], rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(our_itm, ref["itm"][:n_tr], rtol=2e-3,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# ViLT early fusion: CE + ITC training parity
# ---------------------------------------------------------------------------


def _make_vilt_ckpt2(tmp_path):
    import torch
    from transformers import (BertTokenizer, ViltConfig, ViltImageProcessor,
                              ViltModel, ViltProcessor)

    vfile = tmp_path / "vilt_vocab.txt"
    vfile.write_text("\n".join(VOCAB) + "\n")
    torch.manual_seed(2)
    cfg = ViltConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, image_size=32,
        patch_size=16, max_position_embeddings=40,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        modality_type_vocab_size=2)
    vilt = ViltModel(cfg)
    ckpt = tmp_path / "vilt_ckpt2"
    vilt.save_pretrained(str(ckpt), safe_serialization=False)
    improc = ViltImageProcessor(size={"shortest_edge": 32}, size_divisor=16)
    tok = BertTokenizer(str(vfile), do_lower_case=True)
    ViltProcessor(improc, tok).save_pretrained(str(ckpt))
    return str(ckpt)


def _run_reference_vilt(env, vilt_ckpt, tmp_path):
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader

    from ref_harness import load_reference

    mods = load_reference({
        "PATH": {3: env["csv"]},
        "IMG_FMT": {3: env["img_fmt"]},
        "MODEL_DIR_DICT": {"vilt": vilt_ckpt},
        "txt_feat_size": 32, "img_feat_size": 32, "fixed_feat_size": 32,
        "results_dir_mm_early": env["res"] + "/",
    })
    me = mods["mm_early"]
    Config = mods["config"].Config

    class Args:
        task = 3
        dropout = 0.0
        weight_decay = WD
        lr = LR
        use_loss_correction = False
        use_clip_loss = True
        beta_itc = 0.1
        use_tim_loss = False
        beta_itm = 0.1
        use_iadds_loss = False
        beta_iadds = None

    torch.manual_seed(30)
    cfg = Config(Args(), model_name="vilt")
    mm = me.MMEarly_Model(cfg, "vilt")
    tr_l, va_l, te_l, weight = mm.load_data(cfg.data, img_file_fmt=cfg.img_fmt,
                                            task_name=cfg.task_name)
    tr_l = DataLoader(tr_l.dataset, collate_fn=mm.collate_fn,
                      batch_size=cfg.batch_size, shuffle=False)

    init_sd = {k: v.clone() for k, v in mm.model.state_dict().items()}
    sd_path = str(tmp_path / "vilt_init.pth")
    torch.save(init_sd, sd_path)

    ce_losses, itc_losses = [], []
    base_fn = nn.CrossEntropyLoss(weight=weight)

    class CeRecorder(nn.Module):
        def forward(self, out, target):
            l = base_fn(out, target)
            ce_losses.append(float(l.detach()))
            return l

    orig_clip = me.clip_loss

    def clip_recorder(logits):
        l = orig_clip(logits)
        itc_losses.append(float(l.detach()))
        return l

    me.clip_loss = clip_recorder
    try:
        mm.train(tr_l, va_l, EPOCHS, CeRecorder(), LR, WD,
                 val_filename=env["res"] + "/ref_vilt_metrics_val.csv")
    finally:
        me.clip_loss = orig_clip
    return {"ce": ce_losses, "itc": itc_losses, "sd_path": sd_path,
            "n_train_batches": len(tr_l)}


# ---------------------------------------------------------------------------
# LXMERT early fusion over shared ROI dumps: CE + ITC training parity
# ---------------------------------------------------------------------------


def _make_lxmert_ckpt(tmp_path):
    import torch
    from transformers import LxmertConfig, LxmertModel, LxmertTokenizer

    vfile = tmp_path / "lx_vocab.txt"
    vfile.write_text("\n".join(VOCAB) + "\n")
    torch.manual_seed(3)
    cfg = LxmertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_attention_heads=2,
        intermediate_size=64, l_layers=2, x_layers=1, r_layers=1,
        visual_feat_dim=16, visual_pos_dim=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    lx = LxmertModel(cfg)
    ckpt = tmp_path / "lxmert_ckpt"
    lx.save_pretrained(str(ckpt), safe_serialization=False)
    LxmertTokenizer(str(vfile), do_lower_case=True).save_pretrained(str(ckpt))
    return str(ckpt)


def _make_roi_dumps(data_path, ids, num_boxes=5, feat_dim=16):
    """Reference-format per-sample FRCNN dumps (datasets.py:289-294 loads
    ``{task}_img_feats/{features,boxes}/`` per epoch; obj_features.py saves
    them with the leading batch dim the train loop later squeezes)."""
    import torch

    feat_dir = os.path.join(data_path, "mvsa_img_feats", "features")
    box_dir = os.path.join(data_path, "mvsa_img_feats", "boxes")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(box_dir, exist_ok=True)
    g = torch.Generator().manual_seed(7)
    for i in ids:
        torch.save(torch.randn(1, num_boxes, feat_dim, generator=g),
                   os.path.join(feat_dir, f"feat_{i}"))
        torch.save(torch.rand(1, num_boxes, 4, generator=g),
                   os.path.join(box_dir, f"nbox_{i}"))


def _run_reference_lxmert(env, lx_ckpt, data_path, tmp_path):
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader

    from ref_harness import load_reference

    mods = load_reference({
        "PATH": {3: env["csv"]},
        "IMG_FMT": {3: env["img_fmt"]},
        "MODEL_DIR_DICT": {"lxmert": lx_ckpt},
        "DATA_PATH": data_path,
        "txt_feat_size": 32, "img_feat_size": 32, "fixed_feat_size": 32,
        "results_dir_mm_early": env["res"] + "/",
    })
    # datasets.py binds DATA_PATH at import (``from config import DATA_PATH``)
    mods["datasets"].DATA_PATH = data_path
    me = mods["mm_early"]
    Config = mods["config"].Config

    class Args:
        task = 3
        dropout = 0.0
        weight_decay = WD
        lr = LR
        use_loss_correction = False
        use_clip_loss = True
        beta_itc = 0.1
        use_tim_loss = False
        beta_itm = 0.1
        use_iadds_loss = False
        beta_iadds = None

    torch.manual_seed(30)
    cfg = Config(Args(), model_name="lxmert")
    mm = me.MMEarly_Model(cfg, "lxmert")
    tr_l, va_l, te_l, weight = mm.load_data(cfg.data, img_file_fmt=cfg.img_fmt,
                                            task_name=cfg.task_name)
    tr_l = DataLoader(tr_l.dataset, batch_size=cfg.batch_size, shuffle=False)

    init_sd = {k: v.clone() for k, v in mm.model.state_dict().items()}
    sd_path = str(tmp_path / "lxmert_init.pth")
    torch.save(init_sd, sd_path)

    ce_losses, itc_losses = [], []
    base_fn = nn.CrossEntropyLoss(weight=weight)

    class CeRecorder(nn.Module):
        def forward(self, out, target):
            l = base_fn(out, target)
            ce_losses.append(float(l.detach()))
            return l

    orig_clip = me.clip_loss

    def clip_recorder(logits):
        l = orig_clip(logits)
        itc_losses.append(float(l.detach()))
        return l

    me.clip_loss = clip_recorder
    try:
        mm.train(tr_l, va_l, EPOCHS, CeRecorder(), LR, WD,
                 val_filename=env["res"] + "/ref_lx_metrics_val.csv")
    finally:
        me.clip_loss = orig_clip
    return {"ce": ce_losses, "itc": itc_losses, "sd_path": sd_path,
            "n_train_batches": len(tr_l)}


def test_lxmert_training_parity_vs_reference(tmp_path, monkeypatch):
    """LXMERT early fusion over shared reference-format ROI dumps
    (CE + beta_itc*ITC): per-step CE and ITC components match the
    reference's torch loop (shuffle off, dropout 0, identical init via the
    reference-ckpt importer, both sides reading the same FRCNN dumps)."""
    import jax

    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3,
                                              n=40)  # 32 train = 2 batches
    lx_ckpt = _make_lxmert_ckpt(tmp_path)
    res = tmp_path / "res"
    res.mkdir()
    data_path = str(res) + "/ours/data/"  # == patch_task's C.DATA_PATH
    _make_roi_dumps(data_path, df["tweet_id"].tolist())
    env = dict(csv=str(csv_path), img_fmt=img_fmt, res=str(res))
    ref = _run_reference_lxmert(env, lx_ckpt, data_path, tmp_path)
    n_tr = ref["n_train_batches"]

    from socialmedia_textimage_classification_auxlosses_tpu.core import (
        config as C,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli import (
        run_mm_early,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build_early import (
        build_mm_early_setup,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.models import (
        hf_import as H,
    )

    patch_task(monkeypatch, C, 3, env["csv"], env["img_fmt"],
               str(res) + "/ours")
    monkeypatch.setitem(C.MODEL_DIR_DICT, "lxmert", lx_ckpt)

    args = run_mm_early.parse_args([
        "--model", "lxmert", "--task", "3", "--dtype", "float32",
        "--attn_impl", "jnp", "--dropout", "0.0", "--lr", str(LR),
        "--weight_decay", str(WD), "--epochs", str(EPOCHS),
        "--use_clip_loss", "--arch", "base",
    ])
    cfg = C.Config(args, model_name="lxmert")
    setup = build_mm_early_setup(args, cfg)
    lx = setup.model.cfg
    assert (lx.l_layers, lx.r_layers, lx.x_layers) == (2, 1, 1)
    state = H.load_torch_file(ref["sd_path"])
    tree = H.import_reference_lxmert(state, lx.l_layers, lx.r_layers,
                                     lx.x_layers)
    merged = H.merge_tower({"root": setup.params["params"]}, tree,
                           path=("root",))
    params = {"params": merged["root"]}
    opt_state = setup.tx.init(params)

    our_ce, our_itc = [], []
    for batch in setup.pipes["train"].device_iter(shuffle=False):
        key = jax.random.fold_in(jax.random.PRNGKey(0), len(our_ce))
        params, opt_state, m = setup.train_step(params, opt_state, batch, key)
        our_ce.append(float(m["cls_loss"]))
        our_itc.append(float(m["itc_loss"]))

    np.testing.assert_allclose(our_ce, ref["ce"][:n_tr], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_itc, ref["itc"][:n_tr], rtol=2e-3,
                               atol=2e-4)


def test_vilt_training_parity_vs_reference(tmp_path, monkeypatch):
    """ViLT early fusion (tiny checkpoint, CE + beta_itc*ITC): per-step CE
    and ITC components match the reference's torch loop (shuffle off,
    dropout 0, identical init via the reference-ckpt importer)."""
    import jax

    # 32 rows -> 16+16 train batches at vilt's task-3 batch size 16
    csv_path, img_fmt, df = make_task_fixture(tmp_path / "data", task=3,
                                              n=40)  # 32 train = 2 batches
    vilt_ckpt = _make_vilt_ckpt2(tmp_path)
    res = tmp_path / "res"
    res.mkdir()
    env = dict(csv=str(csv_path), img_fmt=img_fmt, res=str(res))
    ref = _run_reference_vilt(env, vilt_ckpt, tmp_path)
    n_tr = ref["n_train_batches"]

    from socialmedia_textimage_classification_auxlosses_tpu.core import (
        config as C,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli import (
        run_mm_early,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build_early import (
        build_mm_early_setup,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.models import (
        hf_import as H,
    )

    patch_task(monkeypatch, C, 3, env["csv"], env["img_fmt"],
               str(res) + "/ours")
    monkeypatch.setitem(C.MODEL_DIR_DICT, "vilt", vilt_ckpt)

    args = run_mm_early.parse_args([
        "--model", "vilt", "--task", "3", "--dtype", "float32",
        "--attn_impl", "jnp", "--dropout", "0.0", "--lr", str(LR),
        "--weight_decay", str(WD), "--epochs", str(EPOCHS),
        "--use_clip_loss",
    ])
    cfg = C.Config(args, model_name="vilt")
    setup = build_mm_early_setup(args, cfg)
    state = H.load_torch_file(ref["sd_path"])
    tree = H.import_reference_vilt(state, setup.model.cfg.layers)
    merged = H.merge_tower({"root": setup.params["params"]}, tree,
                           path=("root",))
    params = {"params": merged["root"]}
    opt_state = setup.tx.init(params)

    our_ce, our_itc = [], []
    for batch in setup.pipes["train"].device_iter(shuffle=False):
        key = jax.random.fold_in(jax.random.PRNGKey(0), len(our_ce))
        params, opt_state, m = setup.train_step(params, opt_state, batch, key)
        our_ce.append(float(m["cls_loss"]))
        our_itc.append(float(m["itc_loss"]))

    np.testing.assert_allclose(our_ce, ref["ce"][:n_tr], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_itc, ref["itc"][:n_tr], rtol=2e-3,
                               atol=2e-4)
