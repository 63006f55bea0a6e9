"""Eval/serving-time parameter pre-cast: stream tower weights at bf16.

Every matmul-consumed weight in this framework is stored float32 and cast to
the computation dtype at use (``models/encoder.py:134,144,166`` — the
flax-standard master-weight layout the trainer needs for exact AdamW). Under
jit that cast re-executes EVERY step, so the eval/serving step streams the
full f32 tower from HBM (profiled at ~0.4-0.7 ms/step of weight reads +
prefetch copy-waits on the flagship, ``tests/perf_profile_step.py``) even
though the MXU only ever sees the bf16 rounding of it.

``cast_params_for_eval`` performs that exact rounding ONCE, host-side: leaves
whose consumers run in the model's compute dtype are converted, and leaves
consumed at float32 — LayerNorm/BatchNorm parameters (``encoder.py:178``),
classification/aux heads (``fusion.py:128-130``), the dual-encoder
projections and ``logit_scale`` (``dual.py:52-58``), BEiT's relative-position
tables (``beit.py:65-73``) — are kept float32. Because the convert inside the
step is then a no-op on an already-bf16 leaf, the outputs are BITWISE
identical to the f32-parameter step (tests/test_eval_cast.py enforces this
per model family); the win is pure HBM bandwidth plus 2x smaller resident
serving weights.

Training keeps f32 masters (the optimizer update must accumulate at f32 —
reference AdamW semantics, ``models/utils.py:280-292``); this is strictly an
inference-path transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Module-path segments whose parameters are consumed at float32 (see module
# docstring). Segment matching keeps this robust across model families: all
# LayerNorms here are named ln/ln_*/*_ln, BatchNorms bn*/stem_bn, and the
# f32 heads use these exact names.
#
# MAINTENANCE CONTRACT: this list duplicates consumption-dtype knowledge that
# lives in the model files, and a miss is silent accuracy drift, not an
# error. Any NEW model family (or newly f32-consumed head) MUST add a
# bitwise cast-vs-f32 case to tests/test_eval_cast.py — that test is the
# mechanism that catches a stale entry here.
_F32_HEAD_SEGMENTS = frozenset({
    "linear", "linear_cls", "linear_tim", "linear_iadds",
    "classifier", "fc", "text_proj", "visual_proj",
    "logit_scale", "rel_pos_table", "batch_stats",
    # f32-consumed heads: FusionHead densities run at text_hidden.dtype,
    # which is float32 out of the towers' final f32 LayerNorm
    # (models/fusion.py:54, encoder.py:182,368), and MMCnnModel projects
    # conv tokens at f32 (fusion.py:256); models/lxmert.py:236 likewise.
    # All are single small heads — keeping them f32 costs ~7 MB.
    "fusion", "linear_fusion", "conv_proj",
})


def _keeps_f32(path) -> bool:
    for entry in path:
        seg = str(getattr(entry, "key", getattr(entry, "name", entry))).lower()
        if seg == "ln" or seg.startswith("ln_") or seg.endswith("_ln"):
            return True
        if "layernorm" in seg or seg == "norm":
            return True
        if seg.startswith("bn") or seg.endswith("bn"):
            return True
        if seg in _F32_HEAD_SEGMENTS:
            return True
    return False


def cast_params_for_eval(variables, compute_dtype):
    """Return ``variables`` with f32 tower weights pre-rounded to
    ``compute_dtype`` (no-op unless it is a sub-f32 float dtype)."""
    dt = jnp.dtype(compute_dtype)
    if dt == jnp.float32 or not jnp.issubdtype(dt, jnp.floating):
        return variables

    def cast(path, leaf):
        if (hasattr(leaf, "dtype") and leaf.dtype == jnp.float32
                and not _keeps_f32(path)):
            return leaf.astype(dt)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, variables)


def eval_cast_bytes_saved(variables, compute_dtype) -> int:
    """Bytes of per-step HBM weight traffic removed by the pre-cast."""
    dt = jnp.dtype(compute_dtype)
    if dt == jnp.float32:
        return 0
    saved = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        if (hasattr(leaf, "dtype") and leaf.dtype == jnp.float32
                and not _keeps_f32(path)):
            saved += leaf.size * (4 - dt.itemsize)
    return saved
