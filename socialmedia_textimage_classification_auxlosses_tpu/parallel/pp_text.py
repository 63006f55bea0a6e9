"""Pipeline-parallel towers (``--mesh_pipe P``).

``make_stack_runner`` builds the GPipe shard_map runner that
``EncoderConfig.pp_runner`` plugs into ``TransformerStack``: the model's own
``apply`` then routes its layer stack through the pipeline — embeddings,
poolers, fusion heads and every other code path (checkpoints, importers,
eval, TIM) flow through unchanged. Works for any tower built on the shared
encoder (run_txt text classifier; the dual encoder's text side in
run_mm_late).

Mesh: ``(data, pipe)`` — batch rows shard over ``data``, the stacked layer
axis shards over ``pipe``; everything else replicates (``PipeMeshPlan``).
Forward and gradient parity with the sequential stack are test-enforced
(tests/test_pp_text.py, tests/test_pipeline.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import EncoderLayer
from .pipeline import make_pipelined_stack


def make_stack_runner(cfg, mesh: Mesh, num_microbatches: int,
                      num_levels: int = 1) -> Callable:
    """Runner ``(stacked_params, x, key_mask, rng) -> hidden`` for
    ``EncoderConfig.pp_runner``. ``cfg``: the encoder config WITHOUT the
    runner set (the layer math must match the sequential stack)."""
    if not cfg.scan_layers:
        raise ValueError("pipeline parallelism requires scan_layers "
                         "(stacked layer params)")

    def layer_fn(p_one, h, km, rng):
        # rng: dropout context {"sites": per-site keys for THIS layer
        # (sliced from encoder.scan_exact_dropout_site_keys stacks),
        # "row0"/"nrows": this microbatch's rows within the global batch}.
        # Injected as explicit (key, row0, nrows) per site — slice-exact
        # masks bit-identical to the nn.scan(split_rngs) stack.
        site_rngs = None if rng is None else {
            name: (k, rng["row0"], rng["nrows"])
            for name, k in rng["sites"].items()}
        return EncoderLayer(cfg).apply({"params": p_one}, h, km, rng is None,
                                       site_rngs=site_rngs)

    run = make_pipelined_stack(layer_fn, mesh,
                               num_microbatches=num_microbatches,
                               num_levels=num_levels)

    def runner(stacked, x, key_mask, rng):
        return run(stacked, x, key_mask, rng=rng)

    return runner


def with_pp_runner(cfg, mesh: Mesh, num_microbatches: int,
                   num_levels: int = 1):
    """cfg -> cfg with pp_runner installed (runner built from the plain cfg
    so layer math is identical). ``num_levels > 1`` = interleaved schedule
    (parallel/pipeline.py)."""
    runner = make_stack_runner(cfg, mesh, num_microbatches, num_levels)
    return dataclasses.replace(cfg, pp_runner=runner)


def _default_stack_pred(keys) -> bool:
    return any(keys[i:i + 2] == ("layers", "layer")
               for i in range(len(keys)))


class PipeMeshPlan:
    """Trainer-compatible mesh plan for the (data, pipe) mesh: batches shard
    on ``data``; scanned layer stacks selected by ``stack_pred`` shard on
    ``pipe``; all other params replicate.

    ``stack_pred(keys)`` decides per param path (tuple of str keys) — the
    default shards every ("layers", "layer") stack; pass a narrower
    predicate when only one tower is pipelined (e.g. the dual encoder's
    text side while the frozen vision stack stays replicated)."""

    def __init__(self, mesh: Mesh,
                 stack_pred: Optional[Callable] = None):
        self.mesh = mesh
        self.stack_pred = stack_pred or _default_stack_pred

    def batch_sharding(self):
        return NamedSharding(self.mesh, P("data"))

    def shard_batch(self, batch):
        return jax.device_put(batch, self.batch_sharding())

    def shard_params(self, params):
        def spec(path, _):
            keys = tuple(str(getattr(p, "key", p)) for p in path)
            if self.stack_pred(keys):
                return NamedSharding(self.mesh, P("pipe"))
            return NamedSharding(self.mesh, P())

        return jax.device_put(
            params, jax.tree_util.tree_map_with_path(spec, params))

    def shard_batch_stacked(self, batches):
        """(K, B, ...) chunks for --steps_per_dispatch: batch axis is axis 1."""
        stacked = NamedSharding(self.mesh, P(None, "data"))
        rep = NamedSharding(self.mesh, P())
        return {k: jax.device_put(v, stacked if np.ndim(v) >= 2 else rep)
                for k, v in batches.items()}

    # Trainer multi-host hooks. Deployment shape: whole pipelines per host
    # (pipe is the MINOR mesh axis so stage hops ride ICI; data rows split
    # across hosts process-major, exactly like the data mesh). Each
    # process's devices then cover an integer number of data rows, so the
    # row assignment is the same contiguous split MeshPlan uses
    # (parallel/mesh.py:93-108). Exercised by the two-process PP case in
    # tests/test_multiprocess.py.

    def _check_local_pipelines(self):
        pipe = self.mesh.shape["pipe"]
        local = jax.local_device_count()
        if jax.process_count() > 1 and local % pipe:
            raise ValueError(
                f"multi-host PP needs whole pipelines per host "
                f"(local devices {local} % pipe {pipe} != 0): a pipeline "
                "stage hop must ride ICI, not DCN")

    def process_rows(self, global_batch_size):
        self._check_local_pipelines()
        p, n = jax.process_index(), jax.process_count()
        per = global_batch_size // n
        if per * n != global_batch_size:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"{n} processes")
        return p * per, (p + 1) * per

    def process_batch(self, local_batch, global_batch_size: int):
        """Global data-sharded batch from this process's local rows
        (``jax.make_array_from_process_local_data``); rows replicate over
        the local pipe stages."""
        self._check_local_pipelines()
        sharding = self.batch_sharding()

        def to_global(x):
            shape = (global_batch_size,) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(sharding, x, shape)

        return jax.tree_util.tree_map(to_global, local_batch)

    def process_batch_stacked(self, local_batches, global_batch_size: int):
        """Pod counterpart of ``shard_batch_stacked``: (K, local_B, ...) ->
        global (K, global_B, ...), axis 1 over ``data``; (K,) scalars
        replicate (identical on every host by construction)."""
        self._check_local_pipelines()
        stacked = NamedSharding(self.mesh, P(None, "data"))
        rep = NamedSharding(self.mesh, P())

        def to_global(x):
            x = np.asarray(x)
            if x.ndim >= 2:
                shape = (x.shape[0], global_batch_size) + tuple(x.shape[2:])
                return jax.make_array_from_process_local_data(stacked, x,
                                                              shape)
            return jax.make_array_from_process_local_data(rep, x, x.shape)

        return {k: to_global(v) for k, v in local_batches.items()}
