"""--mesh_pipe dropout>0 exactness (VERDICT round-4 item 6): the pipelined
stack draws BIT-IDENTICAL dropout masks to the sequential
nn.scan(split_rngs={"dropout": True}) stack, so dropout>0 PP runs are
step-for-step trajectory-comparable. MIGRATION deviation #5 (different key
stream, warned at the CLI) is deleted — the PP runner now receives
precomputed per-(layer, site) keys reproducing flax's scan split/counter
stream (encoder.scan_exact_dropout_site_keys)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
    EncoderConfig, TransformerStack, scan_exact_dropout_site_keys,
)
from socialmedia_textimage_classification_auxlosses_tpu.parallel.pipeline import (
    make_pp_mesh,
)
from socialmedia_textimage_classification_auxlosses_tpu.parallel.pp_text import (
    with_pp_runner,
)

import flax.linen as nn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 virtual devices")


def _cfg(**kw):
    base = dict(vocab_size=64, hidden=8, layers=4, heads=2, mlp_dim=16,
                dropout=0.5, scan_layers=True, attn_impl="jnp")
    base.update(kw)
    return EncoderConfig(**base)


class _Wrap(nn.Module):
    """Nested wrapper so the LazyRng suffix reconstruction is exercised on a
    non-trivial module path, as in the real classifiers."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, det):
        return TransformerStack(self.cfg, name="stack")(x, None, det)


def _run(cfg, params, x, key):
    return _Wrap(cfg).apply(params, x, False, rngs={"dropout": key})


def test_pp_dropout_masks_bitwise_equal_to_scan():
    cfg = _cfg()
    x = jnp.asarray(np.random.RandomState(0).rand(4, 6, 8), jnp.float32)
    seq = _Wrap(cfg)
    params = seq.init(jax.random.PRNGKey(0), x, True)

    mesh = make_pp_mesh(pipe=4, data=1)
    pp_cfg = with_pp_runner(cfg, mesh, num_microbatches=2)
    key = jax.random.PRNGKey(123)
    ref = _run(cfg, params, x, key)
    got = _Wrap(pp_cfg).apply(params, x, False, rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # different key -> different masks (the test is not vacuous)
    other = _Wrap(pp_cfg).apply(params, x, False,
                                rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.abs(np.asarray(ref) - np.asarray(other)).max() > 0


def test_pp_dropout_data_sharded_matches_scan():
    """data=2 x pipe=2: each data shard slices ITS rows of the one logical
    full-batch mask (pjit guarantees the sequential stack's draw is
    sharding-invariant), so DP x PP with dropout still matches."""
    cfg = _cfg()
    x = jnp.asarray(np.random.RandomState(2).rand(4, 6, 8), jnp.float32)
    seq = _Wrap(cfg)
    params = seq.init(jax.random.PRNGKey(0), x, True)
    mesh = make_pp_mesh(pipe=2, data=2)
    pp_cfg = with_pp_runner(cfg, mesh, num_microbatches=2)
    key = jax.random.PRNGKey(11)
    ref = _run(cfg, params, x, key)
    got = _Wrap(pp_cfg).apply(params, x, False, rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pp_dropout_interleaved_matches_scan():
    cfg = _cfg()
    x = jnp.asarray(np.random.RandomState(1).rand(2, 5, 8), jnp.float32)
    seq = _Wrap(cfg)
    params = seq.init(jax.random.PRNGKey(0), x, True)
    mesh = make_pp_mesh(pipe=2, data=1)
    pp_cfg = with_pp_runner(cfg, mesh, num_microbatches=2, num_levels=2)
    key = jax.random.PRNGKey(5)
    ref = _run(cfg, params, x, key)
    got = _Wrap(pp_cfg).apply(params, x, False, rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_site_keys_match_live_make_rng_stream():
    """Cross-check the static reconstruction against flax's live make_rng
    materialisation, dumped from inside the real scan trace."""
    import flax.core.scope as fscope

    cfg = _cfg(layers=3)
    x = jnp.ones((1, 4, 8), jnp.float32)
    m = _Wrap(cfg)
    params = m.init(jax.random.PRNGKey(0), x, True)
    key = jax.random.PRNGKey(99)

    live = []
    orig = fscope.Scope.make_rng

    def spy(self, name="params"):
        out = orig(self, name)
        path = self.path

        def dump(kd, p=path):
            live.append((p, tuple(np.asarray(kd).tolist())))

        jax.debug.callback(dump, jax.random.key_data(out))
        return out

    fscope.Scope.make_rng = spy
    try:
        m.apply(params, x, False, rngs={"dropout": key})
    finally:
        fscope.Scope.make_rng = orig

    from flax.core.scope import LazyRng

    keys = scan_exact_dropout_site_keys(
        LazyRng.create(key, "stack"), ("layers",), cfg.layers)
    by_site = {"attention": set(), "mlp": set()}
    for path, kd in live:
        assert path[:3] == ("stack", "layers", "layer")
        by_site[path[3]].add(kd)
    for site in ("attention", "mlp"):
        # callback order across scan iterations is not guaranteed; compare
        # as sets of materialised keys
        assert len(by_site[site]) == cfg.layers
        got = {tuple(np.asarray(k).tolist())
               for k in np.asarray(jax.random.key_data(keys[site]))}
        assert by_site[site] == got


def test_lxmert_pp_dropout_matches_scan():
    from socialmedia_textimage_classification_auxlosses_tpu.models.lxmert import (
        LxmertBackbone, LxmertConfig,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.parallel.pp_lxmert import (
        make_lxmert_pp_runners,
    )
    import dataclasses

    cfg = LxmertConfig(vocab_size=64, hidden=8, heads=2, mlp_dim=16,
                       l_layers=3, r_layers=2, x_layers=2, dropout=0.5,
                       scan_layers=True, pipe_stages=2, attn_impl="jnp")
    rs = np.random.RandomState(3)
    ids = jnp.asarray(rs.randint(0, 64, (2, 5)), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    tt = jnp.zeros((2, 5), jnp.int32)
    feats = jnp.asarray(rs.rand(2, 4, 2048), jnp.float32)
    boxes = jnp.asarray(rs.rand(2, 4, 4), jnp.float32)

    seq = LxmertBackbone(cfg)
    params = seq.init(jax.random.PRNGKey(0), ids, mask, tt, feats, boxes,
                      deterministic=True)
    key = jax.random.PRNGKey(21)
    ref = seq.apply(params, ids, mask, tt, feats, boxes,
                    deterministic=False, rngs={"dropout": key})

    mesh = make_pp_mesh(pipe=2, data=1)
    runners = make_lxmert_pp_runners(cfg, mesh, num_microbatches=2,
                                     vis_len=4)
    pp = LxmertBackbone(dataclasses.replace(cfg, pp_runners=runners))
    got = pp.apply(params, ids, mask, tt, feats, boxes,
                   deterministic=False, rngs={"dropout": key})
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
