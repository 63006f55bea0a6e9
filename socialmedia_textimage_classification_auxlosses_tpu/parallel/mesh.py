"""Device mesh & sharding rules (SURVEY.md section 5 "distributed
communication backend" — a first-class component here; the reference is
single-process/single-device, ``mm_late.py:30``).

Axes:
  * ``data``  — batch sharding over ICI; gradients are reduced by XLA's
    ``psum`` inserted at the sharded-batch loss; the ITC similarity matrix
    contracts globally (all-gather of the projected embeddings).
  * ``model`` — optional tensor parallelism for the 768-wide towers: dense
    kernels split column-wise (qkv, mlp_in) / row-wise (out, mlp_out), the
    classic Megatron pairing, so each transformer block needs one
    all-reduce per sublayer and the activations stay sharded on heads.

At BERT-base scale TP is off by default (``model=1``); the rules keep every
param annotated so the same jit scales to a larger mesh without code changes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshPlan:
    mesh: Mesh

    @property
    def data_axis_size(self) -> int:
        return self.mesh.shape["data"]

    def batch_spec(self) -> P:
        return P("data")

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P("data"))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    # -- parameter layout ---------------------------------------------------

    def param_spec(self, path) -> P:
        """Megatron-style TP layout keyed on our canonical param names."""
        if self.mesh.shape["model"] == 1:
            return P()
        keys = [str(getattr(p, "key", p)) for p in path]
        name = "/".join(keys)
        leafname = keys[-1]
        parent = keys[-2] if len(keys) > 1 else ""
        if leafname == "kernel":
            if parent in ("query", "key", "value", "mlp_in", "fc_q", "fc_k", "fc_v",
                          "gmu_t", "gmu_v"):
                return P(None, "model")  # column parallel
            if parent in ("out", "mlp_out"):
                return P("model", None)  # row parallel
        if leafname == "bias" and parent in ("query", "key", "value", "mlp_in",
                                             "fc_q", "fc_k", "fc_v", "gmu_t", "gmu_v"):
            return P("model")
        if leafname == "embedding" and parent == "word":
            return P("model", None)  # vocab-sharded embedding
        return P()

    def params_sharding(self, params):
        return jax.tree_util.tree_map_with_path(
            lambda path, x: NamedSharding(self.mesh, self.param_spec(path)), params
        )

    def shard_params(self, params):
        return jax.device_put(params, self.params_sharding(params))

    def shard_batch(self, batch):
        return jax.device_put(batch, self.batch_sharding())

    def shard_batch_stacked(self, batches):
        """A ``(K, B, ...)`` chunk of stacked batches: the batch axis is
        axis 1, so the data axis shards that. Per-chunk scalars/vectors
        (``step_valid``, shape ``(K,)``) replicate."""
        stacked = NamedSharding(self.mesh, P(None, "data"))
        rep = self.replicated()

        def put(x):
            return jax.device_put(x, stacked if np.ndim(x) >= 2 else rep)

        return {k: put(v) for k, v in batches.items()}

    # -- multi-host input sharding -------------------------------------------

    def process_rows(self, global_batch_size: int):
        """This process's contiguous row range of each *global* batch.

        On a pod every host must generate the SAME global row order (the
        trainer seeds its shuffle rng identically on all hosts) and then
        materialise only its slice; rows are assigned contiguously by
        ``jax.process_index()``, matching the default device order of a
        mesh built from ``jax.devices()`` (process-major).
        """
        p, n = jax.process_index(), jax.process_count()
        per = global_batch_size // n
        if per * n != global_batch_size:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"{n} processes")
        return p * per, (p + 1) * per

    def process_batch(self, local_batch, global_batch_size: int):
        """Assemble the global data-sharded batch from this process's local
        rows (``jax.make_array_from_process_local_data``): the host only
        ever touches + transfers its own 1/num_processes of the input."""
        sharding = self.batch_sharding()

        def to_global(x):
            shape = (global_batch_size,) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(sharding, x, shape)

        return jax.tree_util.tree_map(to_global, local_batch)

    def process_batch_stacked(self, local_batches, global_batch_size: int):
        """Pod counterpart of ``shard_batch_stacked``: assemble a global
        ``(K, global_B, ...)`` chunk from this process's ``(K, local_B, ...)``
        stack — axis 1 shards over ``data``; per-chunk ``(K,)`` scalars
        (``step_valid``) replicate, so every host must pass identical values
        (they do: the chunk layout is a pure function of the shared shuffle
        rng). Composes the scanned multi-step dispatch with multi-host
        input sharding (VERDICT.md round-2 item 5)."""
        stacked = NamedSharding(self.mesh, P(None, "data"))
        rep = self.replicated()

        def to_global(x):
            x = np.asarray(x)
            if x.ndim >= 2:
                shape = (x.shape[0], global_batch_size) + tuple(x.shape[2:])
                return jax.make_array_from_process_local_data(stacked, x, shape)
            return jax.make_array_from_process_local_data(rep, x, x.shape)

        return {k: to_global(v) for k, v in local_batches.items()}


def make_mesh_plan(
    data: Optional[int] = None, model: int = 1, devices=None
) -> MeshPlan:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return MeshPlan(Mesh(dev_array, ("data", "model")))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
