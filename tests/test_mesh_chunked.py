"""Scanned multi-step dispatch under the data mesh: the chunked (K, B, ...)
path sharded over 8 virtual devices must produce the same trajectory as the
unsharded per-step loop."""

import jax
import jax.numpy as jnp
import numpy as np

from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import EncoderConfig
from socialmedia_textimage_classification_auxlosses_tpu.models.fusion import (
    MMLateModel, init_mm_late_params,
)
from socialmedia_textimage_classification_auxlosses_tpu.parallel.mesh import (
    make_mesh_plan,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
    make_optimizer, vision_frozen_predicate,
)
from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
    LossConfig, make_train_many, make_train_step,
)

TINY_TEXT = EncoderConfig(vocab_size=50, hidden=16, layers=1, heads=2,
                          mlp_dim=32, max_positions=16, type_vocab=0,
                          dropout=0.0)
TINY_VISION = EncoderConfig(vocab_size=1, hidden=16, layers=1, heads=2,
                            mlp_dim=32, max_positions=1, type_vocab=0,
                            ln_style="pre", dropout=0.0)


def test_chunked_dispatch_on_data_mesh(rng):
    model = MMLateModel(TINY_TEXT, TINY_VISION, num_labels=3,
                        fusion_name="concat", dropout=0.0, patch=8,
                        image_size=16)
    k, b = 4, 8
    ids = jnp.array(rng.randint(0, 50, (k, b, 12)))
    mask = jnp.ones((k, b, 12), jnp.int32)
    pixels = jnp.array(rng.randn(k, b, 3, 16, 16), jnp.float32)
    labels = jnp.eye(3, dtype=jnp.float32)[rng.randint(0, 3, (k, b))]
    stacked = {"ids": ids, "mask": mask, "pixel_values": pixels,
               "labels": labels, "valid": jnp.ones((k, b), jnp.float32)}
    params = init_mm_late_params(model, jax.random.PRNGKey(0), ids[0],
                                 mask[0], pixels[0])

    def forward(p, bt, tim_inputs, dropout_rng, deterministic):
        return model.apply(p, bt["ids"], bt["mask"], bt["pixel_values"],
                           deterministic=True)

    cfg = LossConfig(num_labels=3, use_clip_loss=True, beta_itc=0.1,
                     beta_itm=0.0)
    tx = make_optimizer(1e-3, 2.5e-4, vision_frozen_predicate)
    root = jax.random.PRNGKey(5)

    # unsharded per-step loop (loss trajectory as the invariant: post-Adam
    # params are not bitwise comparable across shardings — reduction-order
    # noise on near-zero grads amplifies to +-lr, see test_mesh.py)
    step = make_train_step(forward, cfg, tx, class_weights=jnp.ones(3),
                           donate=False)
    p_ref, opt = params, tx.init(params)
    losses_ref = []
    for i in range(k):
        bt = {key: v[i] for key, v in stacked.items()}
        p_ref, opt, m = step(p_ref, opt, bt, jax.random.fold_in(root, i))
        losses_ref.append(float(m["loss"]))

    # chunked dispatch on an 8-device data mesh
    plan = make_mesh_plan(data=8, model=1)
    many = make_train_many(forward, cfg, tx, class_weights=jnp.ones(3),
                           donate=False)
    p_dev = plan.shard_params(params)
    stacked_dev = plan.shard_batch_stacked(stacked)
    p_mesh, _, metrics = many(p_dev, tx.init(p_dev), stacked_dev, root, 0)

    np.testing.assert_allclose(np.asarray(metrics["loss"]), losses_ref,
                               rtol=3e-3)
    # params stay within the +-lr-noise envelope of the reference trajectory
    for a, c in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_mesh)):
        assert np.max(np.abs(np.asarray(a) - np.asarray(c))) < 10 * 1e-3
