"""Single-image LXMERT pipeline probe (reference ``models/lxmert.py:36-73`` —
an end-to-end demo of image -> object features -> cross-modal encoder ->
prediction).

    python -m ....cli.demo_lxmert --image path.jpg --text "a tweet" \
        [--num_labels 2]
"""

from __future__ import annotations

import argparse

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(description="LXMERT single-sample probe")
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--text", type=str, required=True)
    parser.add_argument("--num_labels", type=int, default=2)
    parser.add_argument("--arch", type=str, default="tiny",
                        choices=["tiny", "small", "base"])
    parser.add_argument("--obj_source", type=str, default="grid",
                        choices=["grid", "frcnn"],
                        help="object features: grid pseudo-ROIs (fast) or "
                             "the native FRCNN detector (models/frcnn.py; "
                             "reference obj_features.py:142-173 path)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core import config as C
    from ..data.cache import RoiFeatureCache
    from ..data.tokenizers import build_tokenizer
    from ..models.lxmert import LxmertClassifier, LxmertConfig, init_lxmert_params
    from .obj_features import extract_grid_features
    import tempfile

    # 1) object features for the one image (reference lxmert.py:36-73 runs
    # its external FRCNN here; --obj_source frcnn uses OUR detector)
    with tempfile.TemporaryDirectory() as td:
        cache = RoiFeatureCache(td)
        # a literal path with no {} braces passes through .format() unchanged
        if args.obj_source == "frcnn":
            from .obj_features import extract_frcnn_features

            extract_frcnn_features(["demo"], args.image, cache,
                                   tiny=(args.arch == "tiny"))
        else:
            extract_grid_features(["demo"], args.image, cache,
                                  tiny=(args.arch == "tiny"))
        feats, boxes = cache.gather(["demo"])

    # 2) tokenize
    dims = {"tiny": dict(hidden=64, heads=2, mlp_dim=128, l_layers=2,
                         r_layers=1, x_layers=1),
            "small": dict(hidden=256, heads=4, mlp_dim=512, l_layers=4,
                          r_layers=2, x_layers=2),
            "base": dict()}[args.arch]
    cfg = LxmertConfig(**dims)
    tok = build_tokenizer("bert", C.MODEL_DIR_DICT.get("lxmert"), 20,
                          cfg.vocab_size)
    enc = tok([args.text])

    # 3) model forward
    model = LxmertClassifier(cfg, args.num_labels)
    ids = jnp.asarray(enc["ids"])
    mask = jnp.asarray(enc["mask"])
    tt = jnp.asarray(enc.get("token_type_ids", np.zeros_like(enc["ids"])))
    params = init_lxmert_params(model, jax.random.PRNGKey(0), ids, mask, tt,
                                jnp.asarray(feats), jnp.asarray(boxes))
    out = model.apply(params, ids, mask, tt, jnp.asarray(feats),
                      jnp.asarray(boxes))
    probs = jax.nn.softmax(out["out_cls"], axis=-1)
    logger.info("text: %r", args.text)
    logger.info("probabilities: %s", np.asarray(probs)[0])
    logger.info("prediction: class %d", int(jnp.argmax(out["out_cls"][0])))
    return np.asarray(probs)[0]


if __name__ == "__main__":
    main()
