"""Bitwise exactness of the eval/serving bf16 parameter pre-cast
(``utils/cast.py``): pre-rounding matmul-consumed f32 tower weights to the
compute dtype must not change a single output bit, for every model family,
because the jitted step performs exactly that rounding anyway
(models/encoder.py:134,144,166). Also checks that f32-consumed parameters
(LayerNorm/BatchNorm/heads/logit_scale) are left untouched."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
    EncoderConfig,
)
from socialmedia_textimage_classification_auxlosses_tpu.utils.cast import (
    cast_params_for_eval, eval_cast_bytes_saved,
)

TINY = dict(vocab_size=50, hidden=16, layers=2, heads=2, mlp_dim=32,
            max_positions=20, type_vocab=2, dropout=0.0, dtype="bfloat16")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _assert_tree_bitwise(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for (path, x), y in zip(la, lb):
        if x is None:
            assert y is None
            continue
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg=f"output differs at {jax.tree_util.keystr(path)}")


def _run_both(model, params, *args, **kwargs):
    out_f32 = model.apply(params, *args, deterministic=True, **kwargs)
    cast = cast_params_for_eval(params, jnp.bfloat16)
    out_cast = model.apply(cast, *args, deterministic=True, **kwargs)
    _assert_tree_bitwise(out_f32, out_cast)
    return cast


def _count_dtypes(tree):
    n_bf16 = n_f32 = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype"):
            if leaf.dtype == jnp.bfloat16:
                n_bf16 += 1
            elif leaf.dtype == jnp.float32:
                n_f32 += 1
    return n_bf16, n_f32


def test_mm_late_bitwise(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
        MMLateModel, init_mm_late_params,
    )

    text_cfg = EncoderConfig(**TINY)
    vis_cfg = EncoderConfig(**{**TINY, "vocab_size": 1, "max_positions": 1,
                               "type_vocab": 0, "ln_style": "pre"})
    model = MMLateModel(text_cfg, vis_cfg, num_labels=3,
                        fusion_name="attention", dropout=0.0,
                        patch=8, image_size=16)
    b = 4
    ids = jnp.asarray(rng.randint(0, 50, (b, 12)), jnp.int32)
    mask = jnp.ones((b, 12), jnp.int32)
    tt = jnp.zeros((b, 12), jnp.int32)
    px = jnp.asarray(rng.randn(b, 3, 16, 16), jnp.float32)
    params = init_mm_late_params(model, jax.random.PRNGKey(0), ids, mask, px, tt)

    cast = _run_both(model, params, ids, mask, px, tt,
                     tim_ids=ids[::-1], tim_mask=mask,
                     tim_token_type_ids=tt, iadds_task=True)

    # the cast must have converted the towers and kept the f32 consumers
    n_bf16, _ = _count_dtypes(cast)
    assert n_bf16 > 20
    p = cast["params"]
    assert p["linear_cls"]["kernel"].dtype == jnp.float32
    assert p["dual"]["logit_scale"].dtype == jnp.float32
    assert p["dual"]["text"]["embeddings"]["ln"]["scale"].dtype == jnp.float32
    assert p["dual"]["text"]["encoder"]["layer_0"]["ln_attn"]["scale"].dtype \
        == jnp.float32
    assert (p["dual"]["text"]["encoder"]["layer_0"]["attention"]["query"]
            ["kernel"].dtype == jnp.bfloat16)
    assert eval_cast_bytes_saved(params, jnp.bfloat16) > 0


def test_all_fusion_heads_bitwise(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
        FUSION_NAMES, MMLateModel, init_mm_late_params,
    )

    text_cfg = EncoderConfig(**TINY)
    vis_cfg = EncoderConfig(**{**TINY, "vocab_size": 1, "max_positions": 1,
                               "type_vocab": 0, "ln_style": "pre"})
    b = 3
    ids = jnp.asarray(rng.randint(0, 50, (b, 10)), jnp.int32)
    mask = jnp.ones((b, 10), jnp.int32)
    px = jnp.asarray(rng.randn(b, 3, 16, 16), jnp.float32)
    for fusion in FUSION_NAMES:
        model = MMLateModel(text_cfg, vis_cfg, num_labels=2,
                            fusion_name=fusion, dropout=0.0,
                            patch=8, image_size=16)
        params = init_mm_late_params(model, jax.random.PRNGKey(1), ids, mask, px)
        _run_both(model, params, ids, mask, px)


def test_vilt_bitwise(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.vilt import (
        ViltClassifier,
    )

    cfg = EncoderConfig(**TINY)
    model = ViltClassifier(cfg, num_labels=3, patch=8, image_size=32,
                           dropout=0.0)
    b = 3
    ids = jnp.asarray(rng.randint(0, 50, (b, 8)), jnp.int32)
    mask = jnp.ones((b, 8), jnp.int32)
    tt = jnp.zeros((b, 8), jnp.int32)
    px = jnp.asarray(rng.randn(b, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, tt, px,
                        tim_ids=ids, tim_mask=mask, tim_token_type_ids=tt)
    _run_both(model, params, ids, mask, tt, px,
              tim_ids=ids[::-1], tim_mask=mask, tim_token_type_ids=tt)


def test_lxmert_bitwise(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.lxmert import (
        LxmertClassifier, LxmertConfig,
    )

    cfg = LxmertConfig(vocab_size=60, hidden=16, heads=2, mlp_dim=32,
                       max_positions=20, l_layers=2, r_layers=1, x_layers=1,
                       visual_feat_dim=8, dropout=0.0, dtype="bfloat16")
    model = LxmertClassifier(cfg, num_labels=3, dropout=0.0)
    b = 3
    ids = jnp.asarray(rng.randint(0, 60, (b, 9)), jnp.int32)
    mask = jnp.ones((b, 9), jnp.int32)
    tt = jnp.zeros((b, 9), jnp.int32)
    feats = jnp.asarray(rng.randn(b, 5, 8), jnp.float32)
    pos = jnp.asarray(rng.rand(b, 5, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, tt, feats, pos,
                        tim_ids=ids, tim_mask=mask, tim_token_type_ids=tt)
    cast = _run_both(model, params, ids, mask, tt, feats, pos,
                     tim_ids=ids[::-1], tim_mask=mask, tim_token_type_ids=tt)
    # lxmert's linear_fusion is f32-consumed (models/lxmert.py:236)
    assert cast["params"]["linear_fusion"]["kernel"].dtype == jnp.float32


def test_mmbt_bitwise(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.mmbt import (
        MmbtClassifier,
    )

    model = MmbtClassifier(EncoderConfig(**{**TINY, "vocab_size": 64,
                                            "max_positions": 64}),
                           num_labels=3, cnn_name="resnet50", dropout=0.0)
    b = 3
    L = 12
    ids = np.asarray(rng.randint(4, 60, (b, L)), np.int32)
    ids[:, 0] = 1
    ids[:, -1] = 2
    mask = np.ones((b, L), np.int32)
    px = rng.rand(b, 32, 32, 3).astype(np.float32)
    ids, mask, px = jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(px)
    params = model.init(jax.random.PRNGKey(0), ids, mask, px,
                        tim_ids=ids, tim_mask=mask)
    cast = _run_both(model, params, ids, mask, px,
                     tim_ids=ids[::-1], tim_mask=mask)
    # BatchNorm params and running stats stay f32
    assert _count_dtypes(cast["batch_stats"]) == _count_dtypes(
        params["batch_stats"])


def test_beit_bitwise(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.beit import (
        BeitEncoder,
    )

    cfg = EncoderConfig(**{**TINY, "vocab_size": 1, "max_positions": 1,
                           "type_vocab": 0})
    model = BeitEncoder(cfg, patch=8, image_size=32)
    px = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), px)
    cast = _run_both(model, params, px)
    # the rel-pos bias table is consumed at f32 (models/beit.py:65-73)
    flat = jax.tree_util.tree_leaves_with_path(cast)
    rel = [x for p, x in flat if "rel_pos_table" in jax.tree_util.keystr(p)]
    assert rel and all(x.dtype == jnp.float32 for x in rel)


def test_resnet_bitwise(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.resnet import (
        STAGE_SIZES, ResNet,
    )

    model = ResNet(stage_sizes=STAGE_SIZES["resnet50"], num_labels=3,
                   dtype="bfloat16")
    px = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), px)
    out = model.apply(params, px)
    cast = cast_params_for_eval(params, jnp.bfloat16)
    out_cast = model.apply(cast, px)
    _assert_tree_bitwise(out, out_cast)


def test_noop_for_f32_models(rng):
    from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
        MMLateModel, init_mm_late_params,
    )

    text_cfg = EncoderConfig(**{**TINY, "dtype": "float32"})
    vis_cfg = EncoderConfig(**{**TINY, "vocab_size": 1, "max_positions": 1,
                               "type_vocab": 0, "ln_style": "pre",
                               "dtype": "float32"})
    model = MMLateModel(text_cfg, vis_cfg, num_labels=2, dropout=0.0,
                        patch=8, image_size=16)
    ids = jnp.asarray(rng.randint(0, 50, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    px = jnp.asarray(rng.randn(2, 3, 16, 16), jnp.float32)
    params = init_mm_late_params(model, jax.random.PRNGKey(0), ids, mask, px)
    cast = cast_params_for_eval(params, jnp.float32)
    assert cast is params
    assert eval_cast_bytes_saved(params, jnp.float32) == 0
