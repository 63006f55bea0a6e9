"""Worker for the two-process jax.distributed CPU test
(tests/test_multiprocess.py). Each process owns 4 virtual CPU devices of an
8-device data mesh, materialises only its rows of every global batch, and
runs (a) per-step sharded training via device_iter + process_batch and
(b) the scanned K-step dispatch via device_iter_chunks +
process_batch_stacked — plus a per-host sharded image-cache build.

Run:  python mp_worker.py <process_id> <num_processes> <port> <outdir>
(env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4)
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from socialmedia_textimage_classification_auxlosses_tpu.data.cache import (
        ImageCache,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.data.pipeline import (
        PipelineConfig, SplitPipeline,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.data.prep import (
        SplitArrays,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.data.tokenizers import (
        build_tokenizer,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.models.text import (
        build_text_classifier,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.parallel.mesh import (
        make_mesh_plan,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.optim import (
        make_optimizer,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.train.steps import (
        LossConfig, make_train_many, make_train_step,
    )

    assert jax.process_count() == nproc, jax.process_count()
    # the GLOBAL mesh is always 8 data shards: 4 local devices x 2 processes,
    # or 8 local devices for the single-process reference run
    assert len(jax.devices()) == 8, len(jax.devices())

    # --- shared deterministic data (every host builds the same) ----------
    n, num_labels, batch = 32, 3, 8
    rng = np.random.RandomState(0)
    texts = [" ".join(f"w{i}x{j}" for j in range(1 + i % 6)) for i in range(n)]
    split = SplitArrays(
        ids=np.asarray([str(i + 1) for i in range(n)]),
        ids_num=np.arange(1, n + 1).astype(np.int64),
        text=np.asarray(texts, object),
        labels=np.eye(num_labels, dtype=np.float32)[
            rng.randint(0, num_labels, n)],
    )
    tok = build_tokenizer("bert", None, max_length=16, vocab_size=512)
    pipe = SplitPipeline(split, PipelineConfig(batch, 16, with_images=False),
                         tokenizer=tok)

    model = build_text_classifier("bert", num_labels, None, dropout=0.0,
                                  dtype="float32", attn_impl="jnp",
                                  hidden=32, layers=2, heads=2, mlp_dim=64)
    ids0 = jnp.zeros((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0, ids0, ids0)

    def forward_fn(p, b, tim_inputs, dropout_rng, deterministic):
        logits = model.apply(p, b["ids"], b["mask"], b.get("token_type_ids"),
                             deterministic=True)
        return {"out_cls": logits}

    loss_cfg = LossConfig(num_labels=num_labels)
    tx = make_optimizer(1e-3, 0.0)
    plan = make_mesh_plan(data=8, model=1)
    params = plan.shard_params(params)
    opt_state = tx.init(params)

    # --- (a) per-step path: device_iter -> process_batch -----------------
    step = make_train_step(forward_fn, loss_cfg, tx,
                           class_weights=jnp.ones(num_labels), donate=False)
    losses = []
    for b in pipe.device_iter(shuffle=True, rng=np.random.RandomState(7),
                              mesh_plan=plan):
        b = {k: v for k, v in b.items() if k != "data_id"}
        params, opt_state, m = step(params, opt_state, b,
                                    jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))

    # --- (b) scanned dispatch: device_iter_chunks -> process_batch_stacked
    many = make_train_many(forward_fn, loss_cfg, tx,
                           class_weights=jnp.ones(num_labels), donate=False)
    chunk_losses = []
    for batches, k_real in pipe.device_iter_chunks(
            2, shuffle=True, rng=np.random.RandomState(9), mesh_plan=plan):
        batches = {k: v for k, v in batches.items() if k != "data_id"}
        params, opt_state, m = many(params, opt_state, batches,
                                    jax.random.PRNGKey(2), 0)
        chunk_losses.extend(float(x) for x in np.asarray(m["loss"])[:k_real])

    checksum = float(sum(
        np.abs(np.asarray(jax.device_get(x), np.float64)).sum()
        for x in jax.tree_util.tree_leaves(params)))

    # --- (c) per-host sharded image-cache build --------------------------
    img_dir = os.path.join(outdir, "imgs")
    if pid == 0:
        os.makedirs(img_dir, exist_ok=True)
        from PIL import Image

        for i in range(1, 9):
            arr = (np.random.RandomState(i).rand(16, 16, 3) * 255).astype("uint8")
            Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"))
        open(os.path.join(outdir, "imgs_ready"), "w").write("1")
    else:
        import time

        while not os.path.isfile(os.path.join(outdir, "imgs_ready")):
            time.sleep(0.1)
    cache = ImageCache(os.path.join(outdir, f"cache_p{pid}"), size=16).build(
        [str(i) for i in range(1, 9)], os.path.join(img_dir, "{}.jpg"),
        process_shard=(pid, nproc))
    eager = int(cache.valid.sum())
    gathered = cache.gather([str(i) for i in range(1, 9)])  # fills misses

    # --- (d) pipeline parallelism across processes ------------------------
    # (data=4, pipe=2) over the 8 global devices: with 4 local devices each
    # host holds two whole pipelines (stage hops stay intra-host), rows
    # split process-major via PipeMeshPlan.process_rows/process_batch.
    from socialmedia_textimage_classification_auxlosses_tpu.models.encoder import (
        EncoderConfig, EncoderLayer, TransformerStack,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.parallel.pipeline import (
        make_pipelined_stack, make_pp_mesh,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.parallel.pp_text import (
        PipeMeshPlan,
    )

    pcfg = EncoderConfig(vocab_size=11, hidden=16, layers=4, heads=2,
                         mlp_dim=32, max_positions=8, type_vocab=0,
                         dropout=0.0, scan_layers=True)
    prng = np.random.RandomState(11)
    gx = prng.randn(8, 6, pcfg.hidden).astype(np.float32)  # global batch
    gmask = np.ones((8, 6), np.int32)
    stack = TransformerStack(pcfg)
    pparams = stack.init(jax.random.PRNGKey(3),
                         jnp.asarray(gx), jnp.asarray(gmask), True)

    def layer_fn(p_one, h, km, r):
        return EncoderLayer(pcfg).apply({"params": p_one}, h, km, True)

    pp_mesh = make_pp_mesh(pipe=2, data=4)
    pplan = PipeMeshPlan(pp_mesh)
    lo, hi = pplan.process_rows(8)
    gbatch = pplan.process_batch(
        {"x": gx[lo:hi], "mask": gmask[lo:hi]}, 8)
    pparams = pplan.shard_params(pparams)
    run = make_pipelined_stack(layer_fn, pp_mesh, num_microbatches=2)

    @jax.jit
    def pp_loss_and_grad(p, x, mask):
        def loss_fn(q):
            out = run(q["params"]["layers"]["layer"], x, mask)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return jax.value_and_grad(loss_fn)(p)

    ploss, pgrads = pp_loss_and_grad(pparams, gbatch["x"], gbatch["mask"])
    pp_loss = float(ploss)
    pp_gnorm = float(jnp.sqrt(sum(
        jnp.sum(jax.device_get(g).astype(jnp.float64) ** 2)
        for g in jax.tree_util.tree_leaves(pgrads))))

    with open(os.path.join(outdir, f"out_{pid}.json"), "w") as f:
        json.dump({"losses": losses, "chunk_losses": chunk_losses,
                   "checksum": checksum, "cache_eager": eager,
                   "cache_sum": int(np.asarray(gathered, np.int64).sum()),
                   "pp_loss": pp_loss, "pp_gnorm": pp_gnorm,
                   "devices": len(jax.devices())}, f)


if __name__ == "__main__":
    main()
