"""Row-sparse ("lazy") AdamW for the word-embedding table.

The flagship fine-tune is weight-HBM-bound at the paper's batch size 8:
dense AdamW over Bernice's 250k-row embedding moves ~4.6 GB/step of
parameter + moment traffic for at most ``batch x seq = 1024`` rows that
actually received gradient (BASELINE.md ablation; round-1 verdict item 2).

This module updates only the rows whose token ids appear in the batch:
gather p/m/v rows -> AdamW update -> scatter back (~18 MB instead of GBs).
The backward scatter-add still materialises the dense embedding gradient
(XLA's layout); everything after it is row-sparse.

Semantics vs exact AdamW (reference ``utils.py:280-292``): identical math
for touched rows (same bias correction off the global step, same decoupled
weight decay); rows NOT in the batch keep stale moments and skip decay that
step — the standard "lazy Adam" trade (torch.optim.SparseAdam makes the
same one). When every vocab row appears in the batch the update is exactly
AdamW (tested in tests/test_lazy_emb.py). Off by default: ``--opt_impl
lazy_emb`` opts in.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LazyEmbConfig:
    path: Tuple[str, ...]  # key path of the embedding leaf inside params
    lr: float
    weight_decay: float
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    moment_dtype: str = "float32"  # "bfloat16" halves moment traffic


def find_word_embedding_path(params) -> Optional[Tuple[str, ...]]:
    """Locate the (single) word-embedding leaf: path ending word/embedding."""
    hits = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        if len(keys) >= 2 and keys[-2:] == ("word", "embedding"):
            hits.append(keys)
    if len(hits) != 1:
        return None
    return hits[0]


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    if not path:
        return value
    return {**tree, path[0]: _set(tree[path[0]], path[1:], value)}


def init_lazy_state(params, cfg: LazyEmbConfig):
    emb = _get(params, cfg.path)
    dt = jnp.dtype(cfg.moment_dtype)
    return {
        "mu": jnp.zeros(emb.shape, dt),
        "nu": jnp.zeros(emb.shape, dt),
        "count": jnp.zeros((), jnp.int32),
    }


OOB_ID = jnp.iinfo(jnp.int32).max  # positive out-of-bounds marker


def unique_ids(token_ids):
    """Fixed-size unique over the batch's token ids.

    Fill slots get a huge positive id — out of bounds for any vocab, so the
    row scatters in ``row_update`` drop them (``mode="drop"``; negative ids
    would WRAP per numpy semantics and corrupt the last row). ``inv`` never
    references fill slots (it indexes the true uniques only).
    """
    flat = token_ids.reshape(-1).astype(jnp.int32)
    return jnp.unique(flat, size=flat.shape[0], fill_value=OOB_ID,
                      return_inverse=True)


def row_update(emb, lazy_state, uids, g_rows, cfg: LazyEmbConfig):
    """One AdamW step on the gathered rows; returns (emb', lazy_state').

    ``g_rows[k]`` is the gradient of row ``uids[k]``; out-of-bounds slots
    (``OOB_ID`` padding from ``unique_ids``) are dropped at scatter time.
    """
    count = lazy_state["count"] + 1
    t = count.astype(jnp.float32)

    # OOB gather clamps to the last row; the values are garbage but their
    # scatters below are dropped, so they never land anywhere.
    p_rows = emb[uids].astype(jnp.float32)
    m_rows = lazy_state["mu"][uids].astype(jnp.float32)
    v_rows = lazy_state["nu"][uids].astype(jnp.float32)
    g_rows = g_rows.astype(jnp.float32)

    m_new = cfg.b1 * m_rows + (1.0 - cfg.b1) * g_rows
    v_new = cfg.b2 * v_rows + (1.0 - cfg.b2) * jnp.square(g_rows)
    m_hat = m_new / (1.0 - cfg.b1 ** t)
    v_hat = v_new / (1.0 - cfg.b2 ** t)
    upd = m_hat / (jnp.sqrt(v_hat) + cfg.eps) + cfg.weight_decay * p_rows
    p_new = (p_rows - cfg.lr * upd).astype(emb.dtype)

    dt = lazy_state["mu"].dtype
    new_state = {
        "mu": lazy_state["mu"].at[uids].set(m_new.astype(dt), mode="drop"),
        "nu": lazy_state["nu"].at[uids].set(v_new.astype(dt), mode="drop"),
        "count": count,
    }
    return emb.at[uids].set(p_new, mode="drop"), new_state


def lazy_emb_update(params, lazy_state, grads, token_ids, cfg: LazyEmbConfig):
    """Dense-gradient fallback: gather the touched rows out of the dense
    embedding gradient, then ``row_update``. Used when the model's forward
    cannot take pre-gathered ``word_embeds`` (in which case the backward
    already materialised the dense scatter-add and only the optimizer
    traffic is saved)."""
    emb = _get(params, cfg.path)
    g = _get(grads, cfg.path)
    uids, _ = unique_ids(token_ids)
    emb_new, new_state = row_update(emb, lazy_state, uids, g[uids], cfg)
    return _set(params, cfg.path, emb_new), new_state


def lazy_emb_predicate(cfg: LazyEmbConfig):
    """Optimizer freeze-predicate for the lazily-updated leaf."""

    def pred(path, _):
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        return keys == cfg.path

    return pred
