"""Config & task registry (L0).

TPU-native re-design of the reference's ``models/config.py`` (reference
``config.py:1-157``): the per-task data loading / label construction /
batch-size / aux-loss-flag logic lives in one dataclass, and the module-level
constant tables (``TASKS``/``PATH``/``IMG_FMT``/``CLASSES``/
``MODEL_DIR_DICT``/``metric_names``) are preserved verbatim as the public
registry so the four CLI runners keep the reference's flag surface and
artifact-naming contract.

Paths are anchored at ``SMTC_DATA_PATH`` / ``SMTC_RESULTS_PATH`` environment
variables (default: ``<repo>/data/`` and ``<repo>/results/``) instead of the
reference's hard-coded relative paths (reference ``config.py:97,130``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import numpy as np

# ---------------------------------------------------------------------------
# Constants (reference config.py:80-152)
# ---------------------------------------------------------------------------

txt_feat_size = 768
fixed_feat_size = 768
img_feat_size = 768
img_feat_size_cnn = 2048

TASKS = {
    0: "text_is_represented",
    1: "image_adds",
    2: "tir",
    3: "mvsa",
    4: "mhp",
    5: "mic",
    6: "msd",
}


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


DATA_PATH = os.environ.get("SMTC_DATA_PATH", os.path.join(_repo_root(), "data") + os.sep)
RES_PATH = os.environ.get("SMTC_RESULTS_PATH", os.path.join(_repo_root(), "results") + os.sep)

PATH = {
    0: DATA_PATH + "data_key_imgtxt_random.csv",
    1: DATA_PATH + "data_key_imgtxt_random.csv",
    2: DATA_PATH + "data_key_imgtxt_random.csv",
    3: DATA_PATH + "data_key_mvsa.csv",
    4: DATA_PATH + "data_key_mhp.csv",
    5: DATA_PATH + "data_key_mic.csv",
    6: DATA_PATH + "data_key_msd.csv",
}

IMG_FMT = {
    0: DATA_PATH + "text-image/T{}.jpg",
    1: DATA_PATH + "text-image/T{}.jpg",
    2: DATA_PATH + "text-image/T{}.jpg",
    3: DATA_PATH + "MVSA-Single/data/{}.jpg",
    4: DATA_PATH + "MHP/Data/Images/{}.jpg",
    5: DATA_PATH + "MIC/spc_imgs_twitter/{}_1.jpg",
    6: DATA_PATH + "MSD/dataset_image/{}.jpg",
}

CLASSES = {
    2: [
        "image adds and text is represented",
        "image adds and text is not represented",
        "image does not add and text is represented",
        "image does not adds and text is not represented",
    ],
    3: ["neutral", "positive", "negative"],
    6: ["not sarcastic", "sarcastic"],
}

EMPTY_IMG = DATA_PATH + "MIC/empty_image.png"
TDATA5 = DATA_PATH + "text_data_mic.csv"

metric_names = [
    "f1_weighted",
    "f1_macro",
    "precision_weighted",
    "precision_macro",
    "recall_weighted",
    "recall_macro",
    "loss",
]

results_dir_txt = RES_PATH + "txt_only/"
results_dir_img = RES_PATH + "img_only/"
results_dir_mm_early = RES_PATH + "mm_early/"
results_dir_mm_late = RES_PATH + "mm_late/"
results_dir_mmbt = RES_PATH + "mmbt/"
IMAGE_ADDS = results_dir_mm_late + "bernice-vit-attention_task{}_seed30_preds_lm.csv"

# Noisy-label transition matrix for the (binary) loss-correction objective.
# The reference imports ``T`` from config (reference utils.py:16, mm_early.py:29)
# but never defines it — an ImportError on the published snapshot. We define
# the evident intent: row i = P(observed label | true label i); identity +
# symmetric 10% flip noise as the neutral default (arXiv 2102.05336).
T = [[0.9, 0.1], [0.1, 0.9]]

# Model-name -> local pretrained-weight directory. HF-hub ids kept as comments
# (reference config.py:139-152). Directories may contain HF checkpoints
# (pytorch_model.bin / model.safetensors + tokenizer files); when absent the
# framework falls back to random init + a hashing tokenizer so every code path
# runs fully offline.
MODEL_DIR_DICT = {
    "bert": os.environ.get("SMTC_BERT_DIR", DATA_PATH + "hub/BERT-base/"),          # bert-base-uncased
    "bertweet": os.environ.get("SMTC_BERTWEET_DIR", DATA_PATH + "hub/BERTWEET-base/"),  # vinai/bertweet-base
    "roberta": os.environ.get("SMTC_ROBERTA_DIR", DATA_PATH + "hub/RoBERTa-base/"),  # roberta-base
    "bernice": os.environ.get("SMTC_BERNICE_DIR", DATA_PATH + "hub/BERNICE/"),       # jhu-clsp/bernice
    "vit": os.environ.get("SMTC_VIT_DIR", DATA_PATH + "hub/ViT/"),                   # google/vit-base-patch16-224-in21k
    "beit": os.environ.get("SMTC_BEIT_DIR", DATA_PATH + "hub/BEiT/"),                # microsoft/beit-base-patch16-224-pt22k-ft22k
    "deit": os.environ.get("SMTC_DEIT_DIR", DATA_PATH + "hub/DEiT/"),                # facebook/deit-base-distilled-patch16-224
    "vilt": os.environ.get("SMTC_VILT_DIR", DATA_PATH + "hub/ViLT/"),                # dandelin/vilt-b32-mlm
    # MMBT has no pretrained fusion checkpoint — its joint encoder loads
    # bert-base-uncased + a torchvision ResNet trunk (models/mmbt.py)
    "mmbt": os.environ.get("SMTC_MMBT_DIR", DATA_PATH + "hub/BERT-base/"),
    "lxmert": os.environ.get("SMTC_LXMERT_DIR", DATA_PATH + "hub/LXMERT/"),          # unc-nlp/lxmert-base-uncased
    "frcnn": os.environ.get("SMTC_FRCNN_DIR", DATA_PATH + "hub/FRCNN/"),             # unc-nlp/frcnn-vg-finetuned
    "resnet50": os.environ.get("SMTC_RESNET50_DIR", DATA_PATH + "hub/ConvModels/resnet50.npz"),
    "resnet152": os.environ.get("SMTC_RESNET152_DIR", DATA_PATH + "hub/ConvModels/resnet152.npz"),
}


# ---------------------------------------------------------------------------
# Runtime (TPU) configuration — no analogue in the reference; owns dtype
# policy, kernel selection and mesh shape for the compiled path.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RuntimeConfig:
    """How the compiled train/eval step maps onto the hardware."""

    # bfloat16 activations on TPU keep matmuls on the MXU at full rate;
    # params and loss math stay float32.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # "auto": Pallas kernels on TPU backends, jnp reference path elsewhere.
    use_pallas: str = "auto"
    # Mesh axis sizes; data axis is sharded over ICI. None = all devices on data.
    mesh_data: Optional[int] = None
    mesh_model: int = 1
    # Gradient rematerialisation of encoder layers (HBM <-> FLOPs trade).
    remat: bool = False
    # Host->device prefetch depth for the input pipeline.
    prefetch: int = 2

    @classmethod
    def for_tests(cls) -> "RuntimeConfig":
        return cls(compute_dtype="float32", use_pallas="never")


# ---------------------------------------------------------------------------
# Config (reference config.py:1-77)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Config:
    """Per-run configuration: task data, labels, aux-loss flags.

    Mirrors the behaviour of the reference ``Config.__init__``
    (reference ``config.py:6-77``): task-indexed CSV loading, label
    construction (task 2 builds a 4-way label by argmax over four one-hot
    columns — reference ``config.py:18-26``), per-task batch size and
    num_labels, max_length (40 for ViLT, else 128 — reference
    ``config.py:57-60``), and the ``loss_str`` artifact-name tag
    (reference ``config.py:69-76``).
    """

    task: int
    data: Any  # pandas.DataFrame with columns tweet_id,text,label,split
    num_labels: int
    batch_size: int
    img_fmt: str
    task_name: str
    classes: Optional[List[str]]
    dropout: float
    weight_decay: float
    lr: float
    max_length: int
    multilabel: bool
    # aux losses (multimodal only)
    use_clip_loss: bool = False
    use_tim_loss: bool = False
    use_iadds_loss: bool = False  # deprecated in reference (config.py:65)
    beta_itc: Optional[float] = None
    beta_itm: Optional[float] = None
    beta_iadds: Optional[float] = None
    loss_str: str = ""
    use_loss_correction: bool = False  # deprecated in reference (config.py:77)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)

    def __init__(self, args, model_name=None, multimodal=True, txt=False,
                 runtime: Optional[RuntimeConfig] = None):
        import pandas as pd

        task = args.task
        self.task = task
        self.multilabel = task in {10}
        self.column_names = ["tweet_id", "text", "label", "split"]
        data_key = pd.read_csv(PATH[task])
        if task < 2:
            self.data = data_key[["tweet_id", "text", TASKS[task], "split"]].rename(
                columns={TASKS[task]: "label"}
            )
            self.num_labels = 2
            self.batch_size = 8
        elif task == 2:
            data = data_key[["tweet_id", "text", "split"]].copy()
            df_labels = data_key[
                [
                    "image_adds_text_repr",
                    "image_adds_text_notrepr",
                    "image_notadds_text_repr",
                    "image_notadds_text_notrepr",
                ]
            ].to_numpy()
            data["label"] = np.argmax(df_labels, axis=1)
            self.data = data[["tweet_id", "text", "label", "split"]]
            self.num_labels = 4
            self.batch_size = 8
        elif task == 3:
            self.data = data_key[self.column_names]
            self.num_labels = 3
            self.batch_size = 16
        elif task == 4:
            self.data = data_key[self.column_names]
            self.num_labels = 4
            self.batch_size = 8
        elif task == 5:
            self.data = data_key[["id", "text", "label", "split"]].rename(
                columns={"id": "tweet_id"}
            )
            self.num_labels = 2
            self.batch_size = 16
        elif task == 6:
            self.data = data_key[self.column_names]
            self.num_labels = 2
            self.batch_size = 16
        else:
            raise ValueError(f"unknown task {task}")

        self.img_fmt = IMG_FMT[task]
        self.task_name = TASKS[task]
        self.classes = CLASSES.get(task)
        self.dropout = args.dropout
        self.weight_decay = args.weight_decay
        self.lr = args.lr

        # Max length (reference config.py:57-60)
        self.max_length = 40 if model_name == "vilt" else 128

        _apply_aux_loss_flags(self, args, multimodal)
        self.runtime = runtime or RuntimeConfig()


def _apply_aux_loss_flags(cfg, args, multimodal: bool = True) -> None:
    """Aux-loss flags + the ``loss_str`` artifact tag (reference
    ``config.py:62-77``) — shared by ``Config.__init__`` and
    ``serving_config`` so the tag (part of every artifact filename) has one
    definition."""
    cfg.use_clip_loss = False
    cfg.use_tim_loss = False
    cfg.use_iadds_loss = False
    cfg.beta_itc = None
    cfg.beta_itm = None
    cfg.beta_iadds = None
    cfg.loss_str = ""
    if multimodal:
        cfg.use_clip_loss = getattr(args, "use_clip_loss", False)
        cfg.use_tim_loss = getattr(args, "use_tim_loss", False)
        cfg.beta_itc = args.beta_itc if cfg.use_clip_loss else None
        cfg.beta_itm = args.beta_itm if cfg.use_tim_loss else None
        if cfg.use_clip_loss:
            cfg.loss_str += "itc{}".format(cfg.beta_itc)
        if cfg.use_tim_loss:
            cfg.loss_str += "itm{}".format(cfg.beta_itm)
    cfg.use_loss_correction = False


def serving_config(args, model_name=None) -> "Config":
    """A ``Config`` built from the static task registry WITHOUT reading the
    task's data-key CSV — for deployments (``cli/serve.py``) that load a
    trained artifact and classify live requests, where the training dataset
    need not be present. ``data`` holds a tiny synthetic frame (one row per
    split per class) so builders that size pipelines from splits still work;
    no real data is involved."""
    import pandas as pd

    spec = task_spec(args.task)
    cfg = object.__new__(Config)
    cfg.task = args.task
    cfg.multilabel = False
    cfg.column_names = ["tweet_id", "text", "label", "split"]
    rows = []
    for split in ("train", "val", "test"):
        for lbl in range(spec["num_labels"]):
            rows.append({"tweet_id": len(rows), "text": "placeholder",
                         "label": lbl, "split": split})
    cfg.data = pd.DataFrame(rows)
    cfg.num_labels = spec["num_labels"]
    cfg.batch_size = spec["batch_size"]
    cfg.img_fmt = spec["img_fmt"]
    cfg.task_name = spec["name"]
    cfg.classes = spec["classes"]
    cfg.dropout = getattr(args, "dropout", 0.05)
    cfg.weight_decay = getattr(args, "weight_decay", 0.00025)
    cfg.lr = getattr(args, "lr", 1e-5)
    cfg.max_length = 40 if model_name == "vilt" else 128
    _apply_aux_loss_flags(cfg, args, multimodal=True)
    cfg.runtime = RuntimeConfig()
    return cfg


def task_spec(task: int) -> Dict[str, Any]:
    """Static (dataframe-free) view of a task's registry entry."""
    num_labels = {0: 2, 1: 2, 2: 4, 3: 3, 4: 4, 5: 2, 6: 2}[task]
    batch_size = {0: 8, 1: 8, 2: 8, 3: 16, 4: 8, 5: 16, 6: 16}[task]
    return {
        "task": task,
        "name": TASKS[task],
        "key_path": PATH[task],
        "img_fmt": IMG_FMT[task],
        "num_labels": num_labels,
        "batch_size": batch_size,
        "classes": CLASSES.get(task),
    }
