"""Load the reference snapshot (/root/reference, READ-ONLY) as importable
modules so end-to-end *training parity* can be tested against it
(round-1 verdict item 8).

The published snapshot cannot run as-is in this environment:
  * ``config.T`` is imported but never defined (reference utils.py:16) —
    the harness defines the evident 2x2 transition matrix;
  * ``emoji``, ``torchmetrics`` and ``torchvision`` are not installed —
    stubbed here (our demojizer is byte-parity-tested against the
    reference's corpus; the metric stubs use sklearn, which our own
    metrics are parity-tested against).

Nothing under /root/reference is modified; modules are exec'd from their
original paths with ``sys.modules`` pre-seeded.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"


def _stub_emoji():
    from socialmedia_textimage_classification_auxlosses_tpu.data.normalize import (
        demojize_char,
    )

    mod = types.ModuleType("emoji")

    def demojize(text, delimiters=(":", ":")):
        return "".join(demojize_char(ch) for ch in text)

    mod.demojize = demojize
    return mod


def _stub_torchmetrics():
    import torch
    from sklearn.metrics import f1_score, precision_score, recall_score

    fns = {"F1Score": f1_score, "Precision": precision_score,
           "Recall": recall_score}

    class _Metric:
        def __init__(self, fn, task=None, num_classes=None, average="micro",
                     num_labels=None, **kw):
            self.fn = fn
            self.average = average

        def __call__(self, preds, target):
            p = np.asarray(preds)
            t = np.asarray(target)
            return torch.tensor(
                self.fn(t, p, average=self.average, zero_division=0))

    mod = types.ModuleType("torchmetrics")
    cls_mod = types.ModuleType("torchmetrics.classification")
    for name, fn in fns.items():
        cls = (lambda f: (lambda *a, **k: _Metric(f, *a, **k)))(fn)
        setattr(cls_mod, name, cls)
        setattr(mod, name, cls)
    # image_only.py imports BinaryF1Score (never used on the vit path)
    cls_mod.BinaryF1Score = lambda *a, **k: _Metric(f1_score, average="binary")
    mod.classification = cls_mod
    return mod, cls_mod


def _stub_torchvision():
    mod = types.ModuleType("torchvision")
    mod.transforms = types.SimpleNamespace()
    mod.models = types.SimpleNamespace()
    return mod


def _exec_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference(config_overrides: dict):
    """Exec the reference's config/utils/datasets/text_only stack with
    ``config_overrides`` applied (paths, MODEL_DIR_DICT, results dirs).
    Returns a dict of modules. Clobbers generic module names in
    sys.modules ('config', 'utils', 'datasets', 'text_processing') for
    the duration of the process — test-only usage."""
    sys.modules["emoji"] = _stub_emoji()
    tm, tmc = _stub_torchmetrics()
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.classification"] = tmc
    sys.modules["torchvision"] = _stub_torchvision()

    # the reference was written against sklearn 1.x semantics where
    # compute_class_weight accepted lists (utils.py:170-183); modern sklearn
    # validates for ndarray — coerce, changing nothing numerically.
    import sklearn.utils.class_weight as _scw

    if not getattr(_scw.compute_class_weight, "_ref_compat", False):
        _orig = _scw.compute_class_weight

        def _compat(class_weight, *, classes, y):
            return _orig(class_weight, classes=np.asarray(classes),
                         y=np.asarray(y))

        _compat._ref_compat = True
        _scw.compute_class_weight = _compat

    cfg = _exec_module("config", f"{REF}/models/config.py")
    cfg.T = [[0.9, 0.1], [0.1, 0.9]]  # the missing table (SURVEY.md 2.1)
    for k, v in config_overrides.items():
        setattr(cfg, k, v)

    tp = _exec_module("text_processing",
                      f"{REF}/preprocessing/text_processing.py")
    utils = _exec_module("utils", f"{REF}/models/utils.py")
    datasets = _exec_module("datasets", f"{REF}/models/datasets.py")
    text_only = _exec_module("text_only", f"{REF}/models/text_only.py")
    image_only = _exec_module("image_only", f"{REF}/models/image_only.py")
    mm_late = _exec_module("mm_late", f"{REF}/models/mm_late.py")

    # mm_early imports the HF research-project `lxmert_scripts` package the
    # reference never vendored (SURVEY.md 2.1 "external, non-vendored
    # dependency") — stub the three names so the module loads; only the
    # FRCNN paths touch them.
    lx = types.ModuleType("lxmert_scripts")
    lx.modeling_frcnn = types.ModuleType("lxmert_scripts.modeling_frcnn")
    lx.modeling_frcnn.GeneralizedRCNN = object
    lx.utils = types.ModuleType("lxmert_scripts.utils")
    lx.utils.Config = object
    lx.processing_image = types.ModuleType("lxmert_scripts.processing_image")
    lx.processing_image.Preprocess = object
    for name in ("lxmert_scripts", "lxmert_scripts.modeling_frcnn",
                 "lxmert_scripts.utils", "lxmert_scripts.processing_image"):
        sys.modules[name] = getattr(lx, name.split(".")[1]) if "." in name else lx
    mm_early = _exec_module("mm_early", f"{REF}/models/mm_early.py")
    # transformers 4.57 removed ViltImageProcessor.pad_and_create_pixel_mask
    # (the reference's collate_fn calls it, mm_early.py:216); re-attach it as
    # a thin alias of the supported `pad(..., return_pixel_mask=True)`.
    from transformers import ViltImageProcessor

    if not hasattr(ViltImageProcessor, "pad_and_create_pixel_mask"):
        def pad_and_create_pixel_mask(self, pixel_values_list,
                                      return_tensors=None):
            return self.pad(pixel_values_list, return_pixel_mask=True,
                            return_tensors=return_tensors)

        ViltImageProcessor.pad_and_create_pixel_mask = pad_and_create_pixel_mask

    return {"config": cfg, "text_processing": tp, "utils": utils,
            "datasets": datasets, "text_only": text_only,
            "image_only": image_only, "mm_late": mm_late,
            "mm_early": mm_early}
