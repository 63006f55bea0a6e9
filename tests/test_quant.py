"""Weight-only int8 serving quantization (ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.ops.quant import (
    dequantize, make_quantized_eval_forward, quantize_w8, quantized_bytes)


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.05, (256, 128)).astype(np.float32))
    params = {"dense": {"kernel": w, "bias": jnp.zeros((128,))}}
    qt = quantize_w8(params, min_elems=1)
    dq = dequantize(qt, dtype=jnp.float32)
    # symmetric RTN: per-element error <= scale/2 = max|col|/254
    bound = np.abs(np.asarray(w)).max(axis=0, keepdims=True) / 254.0
    err = np.abs(np.asarray(dq["dense"]["kernel"]) - np.asarray(w))
    assert (err <= bound + 1e-7).all()
    # bias untouched
    assert dq["dense"]["bias"].dtype == jnp.float32
    qb, ob = quantized_bytes(qt)
    assert qb == 256 * 128 and ob == 4 * qb


def test_small_leaves_stay_full_precision():
    params = {"head": {"kernel": jnp.ones((8, 4))}}
    qt = quantize_w8(params)  # default min_elems excludes tiny heads
    assert qt.q["head"]["kernel"].dtype == jnp.float32


def test_quantized_eval_forward_logits_close():
    """End-to-end through a real encoder: w8a16 logits must track the
    full-precision logits closely (weight-only symmetric PTQ)."""
    from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
        BertEncoder, EncoderConfig)

    cfg = EncoderConfig(vocab_size=101, hidden=64, layers=2, heads=2,
                        mlp_dim=128, max_positions=16, type_vocab=2,
                        dropout=0.0, dtype="float32")
    enc = BertEncoder(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, 100, (4, 12)), jnp.int32)
    mask = jnp.ones((4, 12), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, mask, None, True)

    def forward_fn(p, batch, tim, drng, det):
        hidden, pooled = enc.apply(p, batch["ids"], batch["mask"], None, True)
        return {"pooled": pooled}

    ref = forward_fn(params, {"ids": ids, "mask": mask}, None, None, True)
    qt = quantize_w8(params, min_elems=1 << 10)
    qfwd = make_quantized_eval_forward(forward_fn, dtype=jnp.float32)
    out = qfwd(qt, {"ids": ids, "mask": mask}, None, None, True)
    a, b = np.asarray(out["pooled"]), np.asarray(ref["pooled"])
    # tanh-pooled activations in [-1, 1]: small absolute drift only
    assert np.abs(a - b).max() < 0.05, np.abs(a - b).max()
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_dequantize_works_under_jit():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(0, 0.1, (128, 128)).astype(np.float32))
    qt = quantize_w8({"k": {"kernel": w}}, min_elems=1)

    @jax.jit
    def f(qt, x):
        p = dequantize(qt, dtype=jnp.float32)
        return x @ p["k"]["kernel"]

    x = jnp.asarray(rng.normal(0, 1, (4, 128)).astype(np.float32))
    got = f(qt, x)
    want = x @ dequantize(qt, jnp.float32)["k"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
