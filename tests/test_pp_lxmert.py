"""Pipeline-parallel LXMERT (parallel/pp_lxmert.py): the three pipelined
segments (lang / vis / cross-modality over the concatenated stream pair)
must match the sequential stacks — outputs AND gradients — and the padded
scanned layout must match the unrolled reference layout exactly.

Reference topology: mm_early.py:105-172 (HF LxmertModel, 9/5/5 stacks)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.models import (
    hf_import as H,
)
from socialmedia_textimage_classification_auxlosses_tpu.models.lxmert import (
    LxmertClassifier, LxmertConfig, init_lxmert_params, pad_layers,
)
from socialmedia_textimage_classification_auxlosses_tpu.parallel.pipeline import (
    make_pp_mesh,
)
from socialmedia_textimage_classification_auxlosses_tpu.parallel.pp_lxmert import (
    lxmert_stack_pred, make_lxmert_pp_runners,
)
from socialmedia_textimage_classification_auxlosses_tpu.parallel.pp_text import (
    PipeMeshPlan,
)

from fixtures import run_cli_in_subprocess

TINY = dict(vocab_size=31, hidden=16, heads=2, mlp_dim=32, max_positions=16,
            l_layers=3, r_layers=2, x_layers=2, visual_feat_dim=8,
            dropout=0.0)
N_LABELS = 3


def _inputs(rng, batch=8, seq=6, rois=4):
    ids = jnp.array(rng.randint(0, TINY["vocab_size"], (batch, seq)), jnp.int32)
    mask = jnp.array(rng.rand(batch, seq) > 0.2, jnp.int32).at[:, 0].set(1)
    tt = jnp.zeros_like(ids)
    feats = jnp.array(rng.randn(batch, rois, TINY["visual_feat_dim"]),
                      jnp.float32)
    boxes = jnp.array(rng.rand(batch, rois, 4), jnp.float32)
    return ids, mask, tt, feats, boxes


def test_pad_layers():
    assert pad_layers(9, 1) == 9
    assert pad_layers(9, 2) == 10
    assert pad_layers(9, 4) == 12
    assert pad_layers(5, 2) == 6
    assert pad_layers(4, 2) == 4


def test_scan_layout_matches_unrolled(rng):
    """Unrolled params -> stack_lxmert_scan_layers -> identical outputs from
    the padded scanned backbone (pad slots are identity)."""
    plain = LxmertClassifier(LxmertConfig(**TINY), N_LABELS, dropout=0.0)
    scanned = LxmertClassifier(
        LxmertConfig(**TINY, scan_layers=True, pipe_stages=2), N_LABELS,
        dropout=0.0)
    ids, mask, tt, feats, boxes = _inputs(rng)
    p_plain = init_lxmert_params(plain, jax.random.PRNGKey(0), ids, mask, tt,
                                 feats, boxes)
    conv = dict(p_plain["params"])
    conv["backbone"] = H.stack_lxmert_scan_layers(
        dict(p_plain["params"]["backbone"]), TINY["l_layers"],
        TINY["r_layers"], TINY["x_layers"], pipe_stages=2)
    # layout agreement with a fresh scanned init
    p_scan = init_lxmert_params(scanned, jax.random.PRNGKey(1), ids, mask, tt,
                                feats, boxes)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_equal(a.shape,
                                                                b.shape),
                           p_scan["params"], conv)

    out_plain = plain.apply(p_plain, ids, mask, tt, feats, boxes,
                            tim_ids=ids, tim_mask=mask, tim_token_type_ids=tt)
    out_scan = scanned.apply({"params": conv}, ids, mask, tt, feats, boxes,
                             tim_ids=ids, tim_mask=mask,
                             tim_token_type_ids=tt)
    for k in ("out_cls", "logits_per_text", "out_tim"):
        np.testing.assert_allclose(np.asarray(out_scan[k]),
                                   np.asarray(out_plain[k]),
                                   atol=1e-5, rtol=1e-5)


def test_pp_matches_sequential_scan(rng):
    """data=2 x pipe=2 mesh: the three pipelined segments reproduce the
    sequential scanned stacks' outputs and parameter gradients."""
    cfg = LxmertConfig(**TINY, scan_layers=True, pipe_stages=2)
    seq_model = LxmertClassifier(cfg, N_LABELS, dropout=0.0)
    ids, mask, tt, feats, boxes = _inputs(rng)
    params = init_lxmert_params(seq_model, jax.random.PRNGKey(0), ids, mask,
                                tt, feats, boxes)

    mesh = make_pp_mesh(pipe=2, data=2)
    runners = make_lxmert_pp_runners(cfg, mesh, num_microbatches=2,
                                     vis_len=feats.shape[1])
    import dataclasses

    pp_model = LxmertClassifier(dataclasses.replace(cfg, pp_runners=runners),
                                N_LABELS, dropout=0.0)
    plan = PipeMeshPlan(mesh, stack_pred=lxmert_stack_pred)
    params_dev = plan.shard_params(params)

    kw = dict(tim_ids=ids, tim_mask=mask, tim_token_type_ids=tt)
    out_seq = seq_model.apply(params, ids, mask, tt, feats, boxes, **kw)
    out_pp = pp_model.apply(params_dev, ids, mask, tt, feats, boxes, **kw)
    for k in ("out_cls", "logits_per_text", "out_tim"):
        np.testing.assert_allclose(np.asarray(out_pp[k]),
                                   np.asarray(out_seq[k]),
                                   atol=1e-5, rtol=1e-5)

    def loss(model):
        def f(p):
            o = model.apply(p, ids, mask, tt, feats, boxes, **kw)
            return (jnp.sum(o["out_cls"] ** 2)
                    + jnp.mean(o["logits_per_text"])
                    + jnp.sum(jnp.abs(o["out_tim"])))
        return f

    g_seq = jax.grad(loss(seq_model))(params)
    g_pp = jax.grad(loss(pp_model))(params_dev)
    flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_pp = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    for path, leaf in flat_seq:
        np.testing.assert_allclose(
            np.asarray(flat_pp[path]), np.asarray(leaf), atol=2e-4,
            rtol=2e-4, err_msg=jax.tree_util.keystr(path))


def test_run_mm_early_lxmert_mesh_pipe_end_to_end(tmp_path):
    """Real CLI: lxmert + --mesh_pipe 2 (tiny arch -> 2/1/1 stacks padded to
    2/2/2 over 2 stages) trains and writes the metrics contract
    (subprocess — see fixtures.run_cli_in_subprocess)."""
    res = run_cli_in_subprocess(
        "run_mm_early",
        ["--model", "lxmert", "--task", "3", "--epochs", "1",
         "--arch", "tiny", "--dtype", "float32", "--attn_impl", "jnp",
         "--scan_layers", "--mesh_pipe", "2", "--log_every", "1"],
        tmp_path)
    out = str(res / "mm_early") + "/"
    found = [f for f in os.listdir(out) if f.endswith("metrics_val.csv")]
    assert found, out
