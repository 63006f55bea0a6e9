"""Fused attention-block kernel (ops/attn_block.py): forward and full
gradient parity vs the jnp oracle, in Pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.ops.attn_block import (
    attn_block, attn_block_reference,
)

B, L, H, HEADS = 3, 16, 32, 4


@pytest.fixture
def inputs(rng):
    x = jnp.array(rng.randn(B, L, H) * 0.5, jnp.float32)
    mask = jnp.array(rng.rand(B, L) > 0.25, jnp.int32).at[:, 0].set(1)
    ws = {}
    for name in ("wq", "wk", "wv", "wo"):
        ws[name] = jnp.array(rng.randn(H, H) / np.sqrt(H), jnp.float32)
    for name in ("bq", "bk", "bv", "bo"):
        ws[name] = jnp.array(rng.randn(H) * 0.1, jnp.float32)
    return x, mask, ws


def _call(impl, x, mask, ws):
    return attn_block(x, mask, ws["wq"], ws["bq"], ws["wk"], ws["bk"],
                      ws["wv"], ws["bv"], ws["wo"], ws["bo"], heads=HEADS,
                      impl=impl)


@pytest.mark.parametrize("impl", ["fused_interpret",
                                  "fused_perhead_interpret"])
def test_forward_matches_oracle(inputs, impl):
    x, mask, ws = inputs
    out_k = _call(impl, x, mask, ws)
    out_r = _call("jnp", x, mask, ws)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("impl", ["fused_interpret",
                                  "fused_perhead_interpret"])
def test_gradients_match_oracle(inputs, impl):
    x, mask, ws = inputs
    cot = jnp.array(np.random.RandomState(1).randn(B, L, H), jnp.float32)

    def loss(impl):
        def f(x, ws):
            return jnp.sum(_call(impl, x, mask, ws) * cot)
        return f

    (gx_k, gw_k) = jax.grad(loss(impl), argnums=(0, 1))(x, ws)
    (gx_r, gw_r) = jax.grad(loss("jnp"), argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               atol=5e-5, rtol=5e-4)
    for name in gw_r:
        np.testing.assert_allclose(
            np.asarray(gw_k[name]), np.asarray(gw_r[name]),
            atol=5e-5, rtol=5e-4, err_msg=name)


def test_forward_bf16_matches_oracle(inputs):
    """The training dtype path (bf16 operands, f32 accumulation)."""
    x, mask, ws = inputs
    xb = x.astype(jnp.bfloat16)
    wsb = {k: v.astype(jnp.bfloat16) for k, v in ws.items()}
    out_k = _call("fused_interpret", xb, mask, wsb).astype(jnp.float32)
    out_r = _call("jnp", xb, mask, wsb).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=5e-2, rtol=5e-2)


def test_no_mask_defaults_to_all_keep(inputs):
    x, _, ws = inputs
    out_k = _call_nomask("fused_interpret", x, ws)
    out_r = _call_nomask("jnp", x, ws)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)


def _call_nomask(impl, x, ws):
    return attn_block(x, None if impl != "jnp" else jnp.ones(x.shape[:2], jnp.int32),
                      ws["wq"], ws["bq"], ws["wk"], ws["bk"],
                      ws["wv"], ws["bv"], ws["wo"], ws["bo"], heads=HEADS,
                      impl=impl)


def test_full_encoder_fused_matches_unfused(rng):
    """BertEncoder with attn_impl='fused_interpret' must match the jnp path
    end-to-end — same params (one tree serves both), same logits, same
    grads."""
    from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
        BertEncoder, EncoderConfig,
    )

    ids = jnp.array(rng.randint(0, 40, (2, 10)))
    mask = jnp.ones((2, 10), jnp.int32).at[1, 6:].set(0)

    def build(impl):
        cfg = EncoderConfig(vocab_size=40, hidden=H, layers=2, heads=HEADS,
                            mlp_dim=2 * H, max_positions=16, type_vocab=2,
                            dropout=0.0, attn_impl=impl)
        return BertEncoder(cfg)

    m_ref = build("jnp")
    m_fused = build("fused_interpret")
    params = m_ref.init(jax.random.PRNGKey(0), ids, mask)
    # identical param trees: the fused branch must be able to consume the
    # unfused init directly
    out_ref, pooled_ref = m_ref.apply(params, ids, mask)
    out_k, pooled_k = m_fused.apply(params, ids, mask)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled_k), np.asarray(pooled_ref),
                               atol=3e-5, rtol=3e-5)

    def loss(m):
        def f(p):
            _, pooled = m.apply(p, ids, mask)
            return jnp.sum(pooled ** 2)
        return f

    g_ref = jax.grad(loss(m_ref))(params)
    g_k = jax.grad(loss(m_fused))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_matches_unfused_encoder_attention(rng):
    """The kernel must reproduce encoder.Attention's self-attention math
    (projection layout + SDPA + out-proj) under the same flax params."""
    from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
        Attention, EncoderConfig,
    )

    cfg = EncoderConfig(hidden=H, heads=HEADS, dropout=0.0, attn_impl="jnp")
    attn = Attention(cfg)
    x = jnp.array(rng.randn(B, L, H) * 0.5, jnp.float32)
    mask = jnp.ones((B, L), jnp.int32)
    params = attn.init(jax.random.PRNGKey(0), x, x, mask, True)
    p = params["params"]
    out_ref = attn.apply(params, x, x, mask, True)
    out_k = attn_block(
        x, mask,
        p["query"]["kernel"], p["query"]["bias"],
        p["key"]["kernel"], p["key"]["bias"],
        p["value"]["kernel"], p["value"]["bias"],
        p["out"]["kernel"], p["out"]["bias"],
        heads=HEADS, impl="fused_interpret",
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)
