"""Pipeline parallelism (parallel/pipeline.py): the GPipe shard_map schedule
must match the sequential scanned stack — outputs AND gradients — on a
data=2 x pipe=4 virtual-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
    EncoderConfig, EncoderLayer, TransformerStack,
)
from socialmedia_textimage_classification_auxlosses_tpu.parallel.pipeline import (
    make_pipelined_stack, make_pp_mesh, shard_stacked_params,
)

CFG = EncoderConfig(vocab_size=11, hidden=16, layers=4, heads=2, mlp_dim=32,
                    max_positions=8, type_vocab=0, dropout=0.0,
                    scan_layers=True)


def _setup(rng, batch=8, seq=6):
    x = jnp.array(rng.randn(batch, seq, CFG.hidden), jnp.float32)
    mask = jnp.array(rng.rand(batch, seq) > 0.2, jnp.int32)
    mask = mask.at[:, 0].set(1)
    stack = TransformerStack(CFG)
    params = stack.init(jax.random.PRNGKey(0), x, mask, True)
    stacked = params["params"]["layers"]["layer"]

    def layer_fn(p_one, h, km, rng):
        return EncoderLayer(CFG).apply({"params": p_one}, h, km, True)

    def sequential(stacked_p, x, mask):
        return stack.apply(
            {"params": {"layers": {"layer": stacked_p}}}, x, mask, True)

    return x, mask, stacked, layer_fn, sequential


@pytest.mark.parametrize("num_micro", [2, 4])
def test_pipeline_matches_sequential(rng, num_micro):
    x, mask, stacked, layer_fn, sequential = _setup(rng)
    mesh = make_pp_mesh(pipe=4, data=2)
    run = make_pipelined_stack(layer_fn, mesh, num_microbatches=num_micro)
    stacked_dev = shard_stacked_params(mesh, stacked)

    out_pp = run(stacked_dev, x, mask)
    out_seq = sequential(stacked, x, mask)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_seq),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential(rng):
    x, mask, stacked, layer_fn, sequential = _setup(rng)
    mesh = make_pp_mesh(pipe=4, data=2)
    run = make_pipelined_stack(layer_fn, mesh, num_microbatches=4)
    cot = jnp.array(np.random.RandomState(3).randn(*x.shape), jnp.float32)

    def loss_pp(p):
        return jnp.sum(run(p, x, mask) * cot)

    def loss_seq(p):
        return jnp.sum(sequential(p, x, mask) * cot)

    g_pp = jax.grad(loss_pp)(shard_stacked_params(mesh, stacked))
    g_seq = jax.grad(loss_seq)(stacked)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    flat_seq = jax.tree_util.tree_leaves(g_seq)
    assert len(flat_pp) == len(flat_seq)
    for a, b in zip(flat_pp, flat_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_pipeline_single_stage_degenerates(rng):
    """pipe=1 must reduce to the plain sequential stack."""
    x, mask, stacked, layer_fn, sequential = _setup(rng, batch=4)
    mesh = make_pp_mesh(pipe=1, data=2)
    run = make_pipelined_stack(layer_fn, mesh, num_microbatches=2)
    np.testing.assert_allclose(
        np.asarray(run(shard_stacked_params(mesh, stacked), x, mask)),
        np.asarray(sequential(stacked, x, mask)), atol=1e-5, rtol=1e-5)


def test_pipeline_rejects_indivisible(rng):
    x, mask, stacked, layer_fn, _ = _setup(rng)
    mesh = make_pp_mesh(pipe=3)
    run = make_pipelined_stack(layer_fn, mesh, num_microbatches=2)
    with pytest.raises(ValueError, match="divisible"):
        # device_put itself rejects the 4-layer axis over 3 stages; the
        # host-rank check in run() catches replicated trees the same way
        run(shard_stacked_params(mesh, stacked), x, mask)


@pytest.mark.parametrize("num_micro", [2, 4])
def test_interleaved_pipeline_matches_sequential(rng, num_micro):
    """Interleaved (circular) schedule, pipe=2 x 2 levels over 4 layers:
    output parity with the sequential stack."""
    x, mask, stacked, layer_fn, sequential = _setup(rng)
    mesh = make_pp_mesh(pipe=2, data=2)
    run = make_pipelined_stack(layer_fn, mesh, num_microbatches=num_micro,
                               num_levels=2)
    stacked_dev = shard_stacked_params(mesh, stacked)
    out_pp = run(stacked_dev, x, mask)
    out_seq = sequential(stacked, x, mask)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_seq),
                               atol=1e-5, rtol=1e-5)


def test_interleaved_pipeline_gradients_match_sequential(rng):
    x, mask, stacked, layer_fn, sequential = _setup(rng)
    mesh = make_pp_mesh(pipe=2, data=2)
    run = make_pipelined_stack(layer_fn, mesh, num_microbatches=4,
                               num_levels=2)
    cot = jnp.array(np.random.RandomState(5).randn(*x.shape), jnp.float32)

    def loss_pp(p):
        return jnp.sum(run(p, x, mask) * cot)

    def loss_seq(p):
        return jnp.sum(sequential(p, x, mask) * cot)

    g_pp = jax.grad(loss_pp)(shard_stacked_params(mesh, stacked))
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_interleaved_all_layers_one_stage(rng):
    """pipe=1 x 4 levels: every layer loops through the single stage."""
    x, mask, stacked, layer_fn, sequential = _setup(rng, batch=4)
    mesh = make_pp_mesh(pipe=1, data=2)
    run = make_pipelined_stack(layer_fn, mesh, num_microbatches=2,
                               num_levels=4)
    np.testing.assert_allclose(
        np.asarray(run(stacked, x, mask)),
        np.asarray(sequential(stacked, x, mask)), atol=1e-5, rtol=1e-5)


def test_interleaved_rejects_too_few_microbatches(rng):
    _, _, _, layer_fn, _ = _setup(rng)
    mesh = make_pp_mesh(pipe=4, data=2)
    with pytest.raises(ValueError, match="microbatches >= stages"):
        make_pipelined_stack(layer_fn, mesh, num_microbatches=2,
                             num_levels=2)


def test_interleave_layer_order():
    from socialmedia_textimage_classification_auxlosses_tpu.parallel.pipeline import (
        interleave_layer_order,
    )

    # 8 layers, 2 stages, 2 levels, npl=2: stage 0 holds chunks 0 (layers
    # 0,1) and 2 (layers 4,5); stage 1 holds chunks 1 (2,3) and 3 (6,7)
    np.testing.assert_array_equal(
        interleave_layer_order(8, 2, 2), [0, 1, 4, 5, 2, 3, 6, 7])


def test_interleaved_pipeline_m_equals_s_boundary(rng):
    """pipe=4 x 2 levels over 8 layers with microbatches == stages: the
    wrap bank's write and next-level read land on the SAME tick — the
    ordering edge the schedule must get right."""
    cfg8 = EncoderConfig(vocab_size=11, hidden=8, layers=8, heads=2,
                         mlp_dim=16, max_positions=8, type_vocab=0,
                         dropout=0.0, scan_layers=True)
    x = jnp.array(rng.randn(8, 4, cfg8.hidden), jnp.float32)
    mask = jnp.ones((8, 4), jnp.int32)
    stack = TransformerStack(cfg8)
    params = stack.init(jax.random.PRNGKey(0), x, mask, True)
    stacked = params["params"]["layers"]["layer"]

    def layer_fn(p_one, h, km, rng_):
        return EncoderLayer(cfg8).apply({"params": p_one}, h, km, True)

    mesh = make_pp_mesh(pipe=4, data=2)
    run = make_pipelined_stack(layer_fn, mesh, num_microbatches=4,
                               num_levels=2)
    out_pp = run(shard_stacked_params(mesh, stacked), x, mask)
    out_seq = stack.apply({"params": {"layers": {"layer": stacked}}}, x,
                          mask, True)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_seq),
                               atol=1e-5, rtol=1e-5)
