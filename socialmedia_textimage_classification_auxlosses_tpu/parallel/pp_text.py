"""Pipeline-parallel text-classifier training (``run_txt --mesh_pipe P``).

Rebuilds ``models.text.TextClassifier``'s forward functionally from the SAME
param tree the flax module owns (scan_layers layout), routing the layer
stack through the GPipe schedule (``parallel/pipeline.py``) while
embeddings / pooler / head run replicated. Forward parity with
``model.apply`` is test-enforced (tests/test_pp_text.py), so checkpoints,
importers and eval flow through unchanged.

Mesh: ``(data, pipe)`` — batch rows shard over ``data``, the stacked layer
axis shards over ``pipe``; everything else replicates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import EncoderLayer, Pooler, TextEmbeddings
from .pipeline import make_pipelined_stack

STACK_PATH = ("tower", "encoder", "layers", "layer")


def _stacked(tree):
    node = tree
    for k in STACK_PATH:
        node = node[k]
    return node


class PipeMeshPlan:
    """Trainer-compatible mesh plan for the (data, pipe) mesh: batches shard
    on ``data``; the scanned layer stack shards on ``pipe``; all other
    params replicate."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def batch_sharding(self):
        return NamedSharding(self.mesh, P("data"))

    def shard_batch(self, batch):
        return jax.device_put(batch, self.batch_sharding())

    def shard_params(self, params):
        def spec(path, _):
            keys = tuple(str(getattr(p, "key", p)) for p in path)
            if any(keys[i:i + len(STACK_PATH)] == STACK_PATH
                   for i in range(len(keys))):
                return NamedSharding(self.mesh, P("pipe"))
            return NamedSharding(self.mesh, P())

        return jax.device_put(
            params, jax.tree_util.tree_map_with_path(spec, params))

    def shard_batch_stacked(self, batches):
        """(K, B, ...) chunks for --steps_per_dispatch: batch axis is axis 1."""
        import numpy as np

        stacked = NamedSharding(self.mesh, P(None, "data"))
        rep = NamedSharding(self.mesh, P())
        return {k: jax.device_put(v, stacked if np.ndim(v) >= 2 else rep)
                for k, v in batches.items()}

    # Trainer multi-host hooks (single-process PP for now)
    def process_rows(self, global_batch_size):
        raise NotImplementedError("PP is single-process in this round")


def make_pp_text_forward(model, mesh: Mesh, num_microbatches: int):
    """forward_fn(params, batch, tim_inputs, dropout_rng, deterministic)
    -> {"out_cls"} for make_train_step / make_eval_step, with the layer
    stack pipelined over the mesh's ``pipe`` axis.

    ``model``: a ``TextClassifier`` whose cfg has ``scan_layers=True``.
    """
    cfg = model.cfg
    if not cfg.scan_layers:
        raise ValueError("pipeline parallelism requires --scan_layers "
                         "(stacked layer params)")

    def layer_fn(p_one, h, km, rng):
        rngs = None if rng is None else {"dropout": rng}
        return EncoderLayer(cfg).apply({"params": p_one}, h, km, rng is None,
                                       rngs=rngs)

    run_stack = make_pipelined_stack(layer_fn, mesh,
                                     num_microbatches=num_microbatches)

    def forward(params, batch, tim_inputs, dropout_rng, deterministic):
        del tim_inputs
        p = params["params"]
        tower = p["tower"]
        if deterministic or dropout_rng is None:
            r_emb = r_layers = r_head = None
        else:
            r_emb, r_layers, r_head = jax.random.split(dropout_rng, 3)
        ids = batch["ids"]
        mask = batch.get("mask")
        if mask is None:
            mask = jnp.ones_like(ids)
        x = TextEmbeddings(cfg).apply(
            {"params": tower["embeddings"]}, ids,
            batch.get("token_type_ids"), mask, deterministic,
            rngs=None if r_emb is None else {"dropout": r_emb},
        )
        hidden = run_stack(_stacked(p), x, mask, rng=r_layers)
        pooled = Pooler(cfg).apply({"params": tower["pooler"]}, hidden)
        feat = pooled if model.use_pooled else hidden[:, 0, :]
        feat = nn.Dropout(model.head_dropout).apply(
            {}, feat, deterministic,
            rngs=None if r_head is None else {"dropout": r_head},
        )
        logits = nn.Dense(model.num_labels, dtype=jnp.float32).apply(
            {"params": p["classifier"]}, feat.astype(jnp.float32))
        return {"out_cls": logits}

    return forward
