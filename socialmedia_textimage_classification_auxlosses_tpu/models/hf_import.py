"""Hugging Face checkpoint ingestion (SURVEY.md section 7 "HF weight
ingestion").

The reference loads pretrained towers with ``AutoModel.from_pretrained``
from local directories (reference ``config.py:139-152``,
``text_only.py:30``). Here the same directories feed weight *import*: a
torch ``pytorch_model.bin`` / ``model.safetensors`` state dict is mapped
tensor-by-tensor onto our flax parameter tree (dense kernels transposed,
conv kernels OIHW->HWIO). When no checkpoint exists the towers run with
random init, so every path works offline.

Import is also the parity harness: tests build a *random* HF torch model
from a config, import its weights, and assert logit equality between the
torch forward and our jitted forward.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def load_state_dict(model_dir: str) -> Optional[Dict[str, np.ndarray]]:
    """Read a torch/safetensors checkpoint from ``model_dir`` into numpy."""
    if not model_dir or not os.path.isdir(model_dir):
        return None
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.isfile(st_path):
        try:
            from safetensors.numpy import load_file

            return dict(load_file(st_path))
        except ImportError:
            pass
    for name in ("pytorch_model.bin", "pytorch_model.pt"):
        path = os.path.join(model_dir, name)
        if os.path.isfile(path):
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            return {k: v.numpy() for k, v in sd.items()}
    flax_path = os.path.join(model_dir, "flax_model.msgpack")
    if os.path.isfile(flax_path):
        from flax import serialization

        with open(flax_path, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        return _flatten("", tree)
    return None


def _flatten(prefix: str, tree) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(key, v))
        else:
            out[key] = np.asarray(v)
    return out


def strip_prefix(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove a single leading model-name scope (``bert.``, ``roberta.``,
    ``vit.``, ...) if every key shares it."""
    for prefix in ("bert.", "roberta.", "xlm-roberta.", "vit.", "beit.", "deit.",
                   "vilt.", "lxmert.", "model."):
        if all(k.startswith(prefix) or k.startswith("pooler") or k.startswith("cls")
               for k in state):
            return {k[len(prefix):] if k.startswith(prefix) else k: v
                    for k, v in state.items()}
    return state


def _dense(state, key):
    return {"kernel": state[f"{key}.weight"].T.copy(), "bias": state[f"{key}.bias"].copy()}


def _dense_nobias(state, key):
    return {"kernel": state[f"{key}.weight"].T.copy()}


def _ln(state, key):
    return {"scale": state[f"{key}.weight"].copy(), "bias": state[f"{key}.bias"].copy()}


def _emb(state, key):
    return {"embedding": state[f"{key}.weight"].copy()}


def import_bert_tower(state: Dict[str, np.ndarray], num_layers: int) -> dict:
    """HF BertModel/RobertaModel/XLM-R state dict -> our BertEncoder tree."""
    state = strip_prefix(state)
    tree: dict = {
        "embeddings": {
            "word": _emb(state, "embeddings.word_embeddings"),
            "position": _emb(state, "embeddings.position_embeddings"),
            "ln": _ln(state, "embeddings.LayerNorm"),
        },
        "encoder": {},
        "pooler": {"dense": _dense(state, "pooler.dense")},
    }
    if "embeddings.token_type_embeddings.weight" in state:
        tree["embeddings"]["token_type"] = _emb(state, "embeddings.token_type_embeddings")
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        tree["encoder"][f"layer_{i}"] = {
            "attention": {
                "query": _dense(state, f"{p}.attention.self.query"),
                "key": _dense(state, f"{p}.attention.self.key"),
                "value": _dense(state, f"{p}.attention.self.value"),
                "out": _dense(state, f"{p}.attention.output.dense"),
            },
            "ln_attn": _ln(state, f"{p}.attention.output.LayerNorm"),
            "mlp": {
                "mlp_in": _dense(state, f"{p}.intermediate.dense"),
                "mlp_out": _dense(state, f"{p}.output.dense"),
            },
            "ln_mlp": _ln(state, f"{p}.output.LayerNorm"),
        }
    return tree


def import_vit_tower(state: Dict[str, np.ndarray], num_layers: int,
                     distilled: bool = False, pooling: str = "tanh") -> dict:
    """HF ViTModel/DeiTModel state dict -> our ViTEncoder tree."""
    state = strip_prefix(state)
    prefix_parts = [state["embeddings.cls_token"]]
    if distilled and "embeddings.distillation_token" in state:
        prefix_parts.append(state["embeddings.distillation_token"])
    prefix_tokens = np.concatenate(prefix_parts, axis=1)
    proj_w = state["embeddings.patch_embeddings.projection.weight"]
    tree: dict = {
        "embeddings": {
            "prefix_tokens": prefix_tokens,
            "pos_embed": state["embeddings.position_embeddings"].copy(),
            "proj": {
                "kernel": np.transpose(proj_w, (2, 3, 1, 0)).copy(),  # OIHW->HWIO
                "bias": state["embeddings.patch_embeddings.projection.bias"].copy(),
            },
        },
        "encoder": {},
        "ln_final": _ln(state, "layernorm"),
    }
    if pooling == "tanh" and "pooler.dense.weight" in state:
        tree["pooler"] = {"dense": _dense(state, "pooler.dense")}
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        tree["encoder"][f"layer_{i}"] = {
            "attention": {
                "query": _dense(state, f"{p}.attention.attention.query"),
                "key": _dense(state, f"{p}.attention.attention.key"),
                "value": _dense(state, f"{p}.attention.attention.value"),
                "out": _dense(state, f"{p}.attention.output.dense"),
            },
            "ln_attn": _ln(state, f"{p}.layernorm_before"),
            "mlp": {
                "mlp_in": _dense(state, f"{p}.intermediate.dense"),
                "mlp_out": _dense(state, f"{p}.output.dense"),
            },
            "ln_mlp": _ln(state, f"{p}.layernorm_after"),
        }
    return tree


def import_beit_tower(state: Dict[str, np.ndarray], num_layers: int) -> dict:
    """HF BeitModel state dict -> our BeitEncoder tree (true BEiT: per-layer
    relative position bias, layer-scale lambdas, no key bias, mean-pool
    LayerNorm pooler)."""
    state = strip_prefix(state)
    proj_w = state["embeddings.patch_embeddings.projection.weight"]
    tree: dict = {
        "cls_token": state["embeddings.cls_token"].copy(),
        "proj": {
            "kernel": np.transpose(proj_w, (2, 3, 1, 0)).copy(),
            "bias": state["embeddings.patch_embeddings.projection.bias"].copy(),
        },
        "pool_ln": _ln(state, "pooler.layernorm"),
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        att = f"{p}.attention.attention"
        tree[f"layer_{i}"] = {
            "lambda_1": state[f"{p}.lambda_1"].copy(),
            "lambda_2": state[f"{p}.lambda_2"].copy(),
            "attention": {
                "query": _dense(state, f"{att}.query"),
                "key": _dense_nobias(state, f"{att}.key"),
                "value": _dense(state, f"{att}.value"),
                "out": _dense(state, f"{p}.attention.output.dense"),
                "rel_pos_table": state[
                    f"{att}.relative_position_bias.relative_position_bias_table"
                ].copy(),
            },
            "ln_attn": _ln(state, f"{p}.layernorm_before"),
            "mlp": {
                "mlp_in": _dense(state, f"{p}.intermediate.dense"),
                "mlp_out": _dense(state, f"{p}.output.dense"),
            },
            "ln_mlp": _ln(state, f"{p}.layernorm_after"),
        }
    return tree


def maybe_import_beit_tower(params: dict, model_dir: str, num_layers: int,
                            path=("params", "tower")) -> dict:
    state = load_state_dict(model_dir)
    if state is None:
        return params
    return merge_tower(params, import_beit_tower(state, num_layers), path)


def merge_tower(params: dict, tower_tree: dict, path=("tower",)) -> dict:
    """Graft an imported tower subtree into an initialised param tree,
    checking shapes leaf-by-leaf."""
    import jax

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    node = params
    for p in path[:-1]:
        node = node[p]
    target = node[path[-1]]

    def _merge(dst, src, scope):
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"unknown param {scope}/{k}")
            if isinstance(v, dict):
                _merge(dst[k], v, f"{scope}/{k}")
            else:
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {scope}/{k}: "
                        f"{dst[k].shape} vs {np.shape(v)}"
                    )
                dst[k] = np.asarray(v, dtype=np.float32)

    _merge(target, tower_tree, "/".join(path))
    return params


def stack_scan_layers(tower_tree: dict, num_layers: int) -> dict:
    """Convert a tower tree's per-layer ``encoder.layer_{i}`` subtrees into
    the ``lax.scan`` layout (``encoder.layers.layer`` with a leading layer
    axis) so pretrained imports work under ``--scan_layers`` (round-1 verdict
    item 9; encoder.py TransformerStack)."""
    enc = tower_tree.get("encoder")
    if not enc or "layer_0" not in enc:
        return tower_tree
    import jax

    per_layer = [enc[f"layer_{i}"] for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per_layer)
    new_enc = {k: v for k, v in enc.items() if not k.startswith("layer_")}
    new_enc["layers"] = {"layer": stacked}
    return {**tower_tree, "encoder": new_enc}


def maybe_import_text_tower(params: dict, model_dir: str, num_layers: int,
                            path=("tower",), scan: bool = False) -> dict:
    state = load_state_dict(model_dir)
    if state is None:
        return params
    tree = import_bert_tower(state, num_layers)
    if scan:
        tree = stack_scan_layers(tree, num_layers)
    return merge_tower(params, tree, path)


def maybe_import_vision_tower(params: dict, model_dir: str, num_layers: int,
                              distilled=False, pooling="tanh", path=("tower",),
                              scan: bool = False) -> dict:
    state = load_state_dict(model_dir)
    if state is None:
        return params
    tree = import_vit_tower(state, num_layers, distilled, pooling)
    if scan:
        tree = stack_scan_layers(tree, num_layers)
    return merge_tower(params, tree, path)


def _bert_layer(state, p):
    """BERT-naming transformer block -> our EncoderLayer subtree."""
    return {
        "attention": {
            "query": _dense(state, f"{p}.attention.self.query"),
            "key": _dense(state, f"{p}.attention.self.key"),
            "value": _dense(state, f"{p}.attention.self.value"),
            "out": _dense(state, f"{p}.attention.output.dense"),
        },
        "ln_attn": _ln(state, f"{p}.attention.output.LayerNorm"),
        "mlp": {
            "mlp_in": _dense(state, f"{p}.intermediate.dense"),
            "mlp_out": _dense(state, f"{p}.output.dense"),
        },
        "ln_mlp": _ln(state, f"{p}.output.LayerNorm"),
    }


def import_vilt(state: Dict[str, np.ndarray], num_layers: int) -> dict:
    """HF ViltModel state dict -> our ViltBackbone tree."""
    state = strip_prefix(state)
    proj_w = state["embeddings.patch_embeddings.projection.weight"]
    tree: dict = {
        "text_embeddings": {
            "word": _emb(state, "embeddings.text_embeddings.word_embeddings"),
            "position": _emb(state, "embeddings.text_embeddings.position_embeddings"),
            "token_type": _emb(state, "embeddings.text_embeddings.token_type_embeddings"),
            "ln": _ln(state, "embeddings.text_embeddings.LayerNorm"),
        },
        "patch_proj": {
            "kernel": np.transpose(proj_w, (2, 3, 1, 0)).copy(),
            "bias": state["embeddings.patch_embeddings.projection.bias"].copy(),
        },
        "image_cls": state["embeddings.cls_token"].copy(),
        "image_pos": state["embeddings.position_embeddings"].copy(),
        "modality_type": _emb(state, "embeddings.token_type_embeddings"),
        "encoder": {},
        "ln_final": _ln(state, "layernorm"),
        "pooler": {"dense": _dense(state, "pooler.dense")},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        tree["encoder"][f"layer_{i}"] = {
            "attention": {
                "query": _dense(state, f"{p}.attention.attention.query"),
                "key": _dense(state, f"{p}.attention.attention.key"),
                "value": _dense(state, f"{p}.attention.attention.value"),
                "out": _dense(state, f"{p}.attention.output.dense"),
            },
            "ln_attn": _ln(state, f"{p}.layernorm_before"),
            "mlp": {
                "mlp_in": _dense(state, f"{p}.intermediate.dense"),
                "mlp_out": _dense(state, f"{p}.output.dense"),
            },
            "ln_mlp": _ln(state, f"{p}.layernorm_after"),
        }
    return tree


def import_lxmert(state: Dict[str, np.ndarray], l_layers: int, r_layers: int,
                  x_layers: int) -> dict:
    """HF LxmertModel state dict -> our LxmertBackbone tree."""
    state = strip_prefix(state)
    tree: dict = {
        "embeddings": {
            "word": _emb(state, "embeddings.word_embeddings"),
            "position": _emb(state, "embeddings.position_embeddings"),
            "token_type": _emb(state, "embeddings.token_type_embeddings"),
            "ln": _ln(state, "embeddings.LayerNorm"),
        },
        "visual_embeddings": {
            "feat_proj": _dense(state, "encoder.visn_fc.visn_fc"),
            "feat_ln": _ln(state, "encoder.visn_fc.visn_layer_norm"),
            "pos_proj": _dense(state, "encoder.visn_fc.box_fc"),
            "pos_ln": _ln(state, "encoder.visn_fc.box_layer_norm"),
        },
    }
    for i in range(l_layers):
        tree[f"lang_layer_{i}"] = _bert_layer(state, f"encoder.layer.{i}")
    for i in range(r_layers):
        tree[f"vis_layer_{i}"] = _bert_layer(state, f"encoder.r_layers.{i}")
    for i in range(x_layers):
        p = f"encoder.x_layers.{i}"
        tree[f"x_layer_{i}"] = {
            "cross_attention": {
                "query": _dense(state, f"{p}.visual_attention.att.query"),
                "key": _dense(state, f"{p}.visual_attention.att.key"),
                "value": _dense(state, f"{p}.visual_attention.att.value"),
                "out": _dense(state, f"{p}.visual_attention.output.dense"),
            },
            "ln_cross": _ln(state, f"{p}.visual_attention.output.LayerNorm"),
            "lang_self": {
                "query": _dense(state, f"{p}.lang_self_att.self.query"),
                "key": _dense(state, f"{p}.lang_self_att.self.key"),
                "value": _dense(state, f"{p}.lang_self_att.self.value"),
                "out": _dense(state, f"{p}.lang_self_att.output.dense"),
            },
            "ln_self_l": _ln(state, f"{p}.lang_self_att.output.LayerNorm"),
            "vis_self": {
                "query": _dense(state, f"{p}.visn_self_att.self.query"),
                "key": _dense(state, f"{p}.visn_self_att.self.key"),
                "value": _dense(state, f"{p}.visn_self_att.self.value"),
                "out": _dense(state, f"{p}.visn_self_att.output.dense"),
            },
            "ln_self_v": _ln(state, f"{p}.visn_self_att.output.LayerNorm"),
            "lang_mlp": {
                "mlp_in": _dense(state, f"{p}.lang_inter.dense"),
                "mlp_out": _dense(state, f"{p}.lang_output.dense"),
            },
            "ln_mlp_l": _ln(state, f"{p}.lang_output.LayerNorm"),
            "vis_mlp": {
                "mlp_in": _dense(state, f"{p}.visn_inter.dense"),
                "mlp_out": _dense(state, f"{p}.visn_output.dense"),
            },
            "ln_mlp_v": _ln(state, f"{p}.visn_output.LayerNorm"),
        }
    return tree


def maybe_import_vilt(params: dict, model_dir: str, num_layers: int,
                      path=("params", "backbone"), scan: bool = False) -> dict:
    state = load_state_dict(model_dir)
    if state is None:
        return params
    tree = import_vilt(state, num_layers)
    if scan:
        tree = stack_scan_layers(tree, num_layers)
    return merge_tower(params, tree, path)


def stack_lxmert_scan_layers(tree: dict, l_layers: int, r_layers: int,
                             x_layers: int, pipe_stages: int = 1) -> dict:
    """Unrolled LXMERT backbone tree -> the scanned layout
    (``{lang,vis,x}_layers.layer`` with a leading layer axis, zero-padded to
    a multiple of ``pipe_stages`` — models/lxmert.py pad_layers; pad slots
    are identity in the scan body so zero params are never observed)."""
    import jax

    from .lxmert import pad_layers

    def _stack(prefix, n):
        per = [tree[f"{prefix}_layer_{i}"] for i in range(n)]
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per)
        n_pad = pad_layers(n, pipe_stages)
        if n_pad > n:
            stacked = jax.tree_util.tree_map(
                lambda a: np.concatenate(
                    [a, np.zeros((n_pad - n,) + a.shape[1:], a.dtype)]),
                stacked)
        return {"layer": stacked}

    out = {k: v for k, v in tree.items()
           if not any(k.startswith(p) for p in
                      ("lang_layer_", "vis_layer_", "x_layer_"))}
    out["lang_layers"] = _stack("lang", l_layers)
    out["vis_layers"] = _stack("vis", r_layers)
    out["x_layers"] = _stack("x", x_layers)
    return out


def maybe_import_lxmert(params: dict, model_dir: str, l_layers: int,
                        r_layers: int, x_layers: int,
                        path=("params", "backbone"), scan: bool = False,
                        pipe_stages: int = 1) -> dict:
    state = load_state_dict(model_dir)
    if state is None:
        return params
    tree = import_lxmert(state, l_layers, r_layers, x_layers)
    if scan:
        tree = stack_lxmert_scan_layers(tree, l_layers, r_layers, x_layers,
                                        pipe_stages)
    return merge_tower(params, tree, path)


def import_dual_encoder(state: Dict[str, np.ndarray], text_layers: int,
                        vision_layers: int, distilled=False,
                        vision_pooling="tanh") -> dict:
    """HF ``VisionTextDualEncoderModel`` state dict -> our DualEncoder tree
    (text tower + vision tower + projections + logit_scale)."""
    text_state = {k[len("text_model."):]: v for k, v in state.items()
                  if k.startswith("text_model.")}
    vision_state = {k[len("vision_model."):]: v for k, v in state.items()
                    if k.startswith("vision_model.")}
    tree = {
        "text": import_bert_tower(text_state, text_layers),
        "vision": import_vit_tower(vision_state, vision_layers, distilled,
                                   vision_pooling),
        "text_proj": _dense_nobias(state, "text_projection"),
        "visual_proj": _dense_nobias(state, "visual_projection"),
        "logit_scale": np.asarray(state["logit_scale"], np.float32).reshape(()),
    }
    return tree


def maybe_import_dual_encoder(params: dict, model_dir: str, text_layers: int,
                              vision_layers: int, distilled=False,
                              vision_pooling="tanh", path=("params", "dual")) -> dict:
    state = load_state_dict(model_dir)
    if state is None:
        return params
    return merge_tower(
        params,
        import_dual_encoder(state, text_layers, vision_layers, distilled,
                            vision_pooling),
        path,
    )


# ---------------------------------------------------------------------------
# Reference MM_Model checkpoints (mm_late.py:50-89 + torch.save at :529-531)
# ---------------------------------------------------------------------------


def import_reference_mm_late(state: Dict[str, np.ndarray], text_layers: int,
                             vision_layers: int, fusion_name: str = "attention",
                             distilled=False, vision_pooling="tanh") -> dict:
    """A reference-trained ``MM_Model`` state dict -> our MMLateModel params.

    Reference param names (mm_late.py:59-89): ``dual_encoder.*`` (the HF
    VisionTextDualEncoderModel), fusion projections ``fc_Q/fc_K/fc_V``,
    ``linear_fusion``, ``aspectattention``, ``linear_gmu_t/v``, and heads
    ``linear_cls``/``linear_tim``/``linear_iadds``. Lets a user of the
    reference bring fine-tuned checkpoints straight into this framework.
    """
    dual_state = {k[len("dual_encoder."):]: v for k, v in state.items()
                  if k.startswith("dual_encoder.")}
    tree: dict = {
        "dual": import_dual_encoder(dual_state, text_layers, vision_layers,
                                    distilled, vision_pooling),
        "linear_cls": _dense(state, "linear_cls"),
        "linear_tim": _dense(state, "linear_tim"),
        "linear_iadds": _dense(state, "linear_iadds"),
    }
    fusion: dict = {}
    if fusion_name == "attention":
        fusion["fc_q"] = _dense(state, "fc_Q")
        fusion["fc_k"] = _dense(state, "fc_K")
        fusion["fc_v"] = _dense(state, "fc_V")
        fusion["linear_fusion"] = _dense(state, "linear_fusion")
    elif fusion_name == "concat":
        fusion["linear_fusion"] = _dense(state, "linear_fusion")
    elif fusion_name == "aspect-att":
        fusion["aspect_attention"] = _dense(state, "aspectattention")
    elif fusion_name == "gmu":
        fusion["gmu_t"] = _dense(state, "linear_gmu_t")
        fusion["gmu_v"] = _dense(state, "linear_gmu_v")
        fusion["linear_fusion"] = _dense(state, "linear_fusion")
    tree["fusion"] = fusion
    return tree


def import_reference_vilt(state: Dict[str, np.ndarray], num_layers: int) -> dict:
    """A reference-trained ``ViLT`` wrapper state dict (mm_early.py:48-58:
    ``model.*`` = HF ViltModel, plus ``linear``/``linear_tim``/``logit_scale``
    heads; the declared-but-unused text/visual projections are skipped) ->
    our ViltClassifier params."""
    backbone_state = {k[len("model."):]: v for k, v in state.items()
                      if k.startswith("model.")}
    return {
        "backbone": import_vilt(backbone_state, num_layers),
        "linear": _dense(state, "linear"),
        "linear_tim": _dense(state, "linear_tim"),
        "logit_scale": np.asarray(state["logit_scale"], np.float32).reshape(()),
    }


def import_reference_lxmert(state: Dict[str, np.ndarray], l_layers: int,
                            r_layers: int, x_layers: int) -> dict:
    """A reference-trained ``Lxmert`` wrapper state dict (mm_early.py:105-119:
    ``model.*`` = HF LxmertModel + ``linear_fusion``/``linear``/``linear_tim``
    /``logit_scale``) -> our LxmertClassifier params."""
    backbone_state = {k[len("model."):]: v for k, v in state.items()
                      if k.startswith("model.")}
    return {
        "backbone": import_lxmert(backbone_state, l_layers, r_layers, x_layers),
        "linear_fusion": _dense(state, "linear_fusion"),
        "linear": _dense(state, "linear"),
        "linear_tim": _dense(state, "linear_tim"),
        "logit_scale": np.asarray(state["logit_scale"], np.float32).reshape(()),
    }


def maybe_import_reference_mm_late(params: dict, ckpt_path: str,
                                   text_layers: int, vision_layers: int,
                                   fusion_name: str, **kw) -> dict:
    state = load_torch_file(ckpt_path)
    if state is None:
        return params
    return merge_tower(
        params,
        import_reference_mm_late(state, text_layers, vision_layers,
                                 fusion_name, **kw),
        path=("params",),
    )


# ---------------------------------------------------------------------------
# torchvision ResNet (reference image_only.py:59-60 loads a local .pth)
# ---------------------------------------------------------------------------


def _conv(state, key):
    return {"kernel": np.transpose(state[f"{key}.weight"], (2, 3, 1, 0)).copy()}


def _bn(state, key):
    return (
        {"scale": state[f"{key}.weight"].copy(), "bias": state[f"{key}.bias"].copy()},
        {"mean": state[f"{key}.running_mean"].copy(),
         "var": state[f"{key}.running_var"].copy()},
    )


def import_resnet(state: Dict[str, np.ndarray], stage_sizes) -> dict:
    """torchvision resnet state dict -> {params, batch_stats} trees matching
    models/resnet.py (fc head intentionally skipped — the reference swaps it
    for a fresh ``num_labels`` head, image_only.py:62-63)."""
    params: dict = {"stem_conv": _conv(state, "conv1")}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn(state, "bn1")
    for s, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            src = f"layer{s + 1}.{b}"
            dst = f"stage{s}_block{b}"
            node_p: dict = {}
            node_s: dict = {}
            for c in (1, 2, 3):
                node_p[f"conv{c}"] = _conv(state, f"{src}.conv{c}")
                node_p[f"bn{c}"], node_s[f"bn{c}"] = _bn(state, f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in state:
                node_p["down_conv"] = _conv(state, f"{src}.downsample.0")
                node_p["down_bn"], node_s["down_bn"] = _bn(state, f"{src}.downsample.1")
            params[dst] = node_p
            stats[dst] = node_s
    return {"params": params, "batch_stats": stats}


def load_torch_file(path: str) -> Optional[Dict[str, np.ndarray]]:
    if not path or not os.path.isfile(path):
        return None
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def maybe_import_resnet(variables: dict, weight_path: str, model_name: str,
                        path=()) -> dict:
    """Graft torchvision resnet weights into an initialised variables dict
    (params + batch_stats). ``path`` addresses the ResNet submodule inside
    each collection (e.g. ("params", "cnn") for MMCnnModel)."""
    from .resnet import STAGE_SIZES

    state = load_torch_file(weight_path)
    if state is None and weight_path and os.path.isdir(weight_path):
        state = load_state_dict(weight_path)
    if state is None:
        return variables
    trees = import_resnet(state, STAGE_SIZES[model_name])
    sub = path[1:] if path and path[0] == "params" else ()
    variables = merge_tower(variables, trees["params"],
                            path=("params",) + tuple(sub))
    variables = merge_tower(variables, trees["batch_stats"],
                            path=("batch_stats",) + tuple(sub))
    return variables


def maybe_import_mmbt(variables: dict, model_dir: str, num_layers: int,
                      cnn_weight_path: str = None,
                      cnn_name: str = "resnet152",
                      scan: bool = False) -> dict:
    """Graft pretrained weights into an initialised MmbtClassifier tree
    (models/mmbt.py): BERT encoder/embeddings/pooler from ``model_dir`` and
    (optionally) a torchvision ResNet trunk from ``cnn_weight_path``. The
    word table moves to the backbone level ("word") because the joint
    sequence embeds through it explicitly; ``img_proj`` and the heads stay
    freshly initialised (no pretrained counterpart)."""
    state = load_state_dict(model_dir)
    if state is not None:
        tree = import_bert_tower(state, num_layers)
        word = tree["embeddings"].pop("word")
        if scan:
            tree = stack_scan_layers(tree, num_layers)
        tree["word"] = word
        variables = merge_tower(variables, tree, path=("params", "backbone"))
    if cnn_weight_path:
        variables = maybe_import_resnet(
            variables, cnn_weight_path, cnn_name,
            path=("params", "backbone", "cnn"))
    return variables
