"""Torch state_dict -> Flax param-tree converters for every model family.

Layout rules (torch -> our NHWC Flax modules):
* Conv2d 3x3 (O,I,Kh,Kw) -> Conv kernel (Kh,Kw,I,O)
* Conv2d 1x1 and Conv1d 1-tap -> our Dense: squeeze taps, transpose to (I,O)
* Linear (O,I) -> Dense kernel (I,O)
* GroupNorm/LayerNorm weight/bias -> scale/bias
* Embedding weight -> Embed ``embedding`` (no transpose)

Each converter returns a nested dict shaped exactly like the target module's
``init`` tree; :func:`validate_against` diff-checks the converted tree against
a reference shape tree so a silent mapping gap cannot ship.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np


Flat = Dict[str, np.ndarray]


def load_torch_state_dict(path: str) -> Flat:
    """Load a torch checkpoint to numpy (CPU), unwrapping ``state_dict``."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().numpy() for k, v in obj.items() if hasattr(v, "numpy")}


# --------------------------------------------------------------------------- #
# small helpers
# --------------------------------------------------------------------------- #


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    assert w.ndim == 4, w.shape
    return np.transpose(w, (2, 3, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:  # 1x1 conv used as Dense
        assert w.shape[2] == w.shape[3] == 1, w.shape
        w = w[:, :, 0, 0]
    elif w.ndim == 3:  # 1-tap conv1d used as Dense
        assert w.shape[2] == 1, w.shape
        w = w[:, :, 0]
    assert w.ndim == 2, w.shape
    return w.T


def _insert(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate assignment at {path}")
    node[path[-1]] = value


def _param_name(torch_param: str, kind: str) -> str:
    if kind == "norm":
        return {"weight": "scale", "bias": "bias"}[torch_param]
    if kind in ("conv", "dense"):
        return {"weight": "kernel", "bias": "bias"}[torch_param]
    if kind == "embed":
        assert torch_param == "weight"
        return "embedding"
    raise ValueError(kind)


_NORM_HINTS = ("norm", "ln_", "layer_norm")


def _leaf_kind(leaf_module: str, w: np.ndarray, dense_leaves, embed_leaves) -> str:
    if any(h in leaf_module for h in _NORM_HINTS) and w.ndim == 1:
        return "norm"
    if leaf_module in embed_leaves:
        return "embed"
    if w.ndim == 4 and w.shape[2] == w.shape[3] == 1 and leaf_module in dense_leaves:
        return "dense"
    if w.ndim == 4:
        return "conv"
    if w.ndim == 3:
        return "dense"   # 1-tap conv1d
    if w.ndim == 2:
        return "dense"
    return "norm" if w.ndim == 1 else "dense"


def validate_against(converted: dict, expected: dict, label: str = "") -> None:
    """Raise if the converted tree's paths/shapes differ from ``expected``
    (e.g. the tree from ``jax.eval_shape`` of ``module.init``)."""

    def walk(tree, prefix):
        out = {}
        for k, v in tree.items():
            p = prefix + (k,)
            if isinstance(v, dict):
                out.update(walk(v, p))
            else:
                out[p] = tuple(v.shape)
        return out

    got, want = walk(converted, ()), walk(expected, ())
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = sorted(
        p for p in set(got) & set(want) if got[p] != want[p]
    )
    if missing or extra or bad:
        msg = [f"conversion mismatch for {label}:"]
        if missing:
            msg.append(f"  missing ({len(missing)}): {missing[:8]}")
        if extra:
            msg.append(f"  extra ({len(extra)}): {extra[:8]}")
        if bad:
            msg.append(
                "  shape mismatch: "
                + str([(p, got[p], want[p]) for p in bad[:8]])
            )
        raise ValueError("\n".join(msg))


# --------------------------------------------------------------------------- #
# EMA / LatentDiffusion state splitting
# --------------------------------------------------------------------------- #


def select_ema_weights(sd: Flat, prefix: str = "model.diffusion_model.") -> Flat:
    """Replace ``prefix`` weights with their LitEma shadows when present.

    LitEma flattens parameter names by deleting dots
    (``model_ema.diffusion_modelout2weight``); the reference's ``ema_scope``
    swaps these in around every sampling call (``ddpm.py:171-184``), so
    conversion must bake them in for use_ema checkpoints (FFHQ/CelebA LDM).
    """
    ema_prefix = "model_ema." + prefix.split(".", 1)[1].split(".")[0]
    # shadow names drop the ROOT module component (LitEma is attached to
    # `self.model`), so derive the strip from the prefix actually given
    # instead of hardcoding "model."
    root = prefix.split(".", 1)[0] + "."
    out = dict(sd)
    hits = 0
    for k in list(sd.keys()):
        if not k.startswith(prefix):
            continue
        ema_key = "model_ema." + k[len(root):].replace(".", "")
        if ema_key in sd:
            out[k] = sd[ema_key]
            hits += 1
    if hits == 0:
        raise ValueError(f"no EMA shadows found under {ema_prefix}*")
    return out


def split_latent_diffusion_state(sd: Flat, use_ema: bool = False):
    """Split a Lightning LatentDiffusion state_dict into its three subtrees:
    (unet_sd, first_stage_sd, cond_stage_sd) with prefixes stripped."""
    if use_ema:
        sd = select_ema_weights(sd)

    def sub(prefix):
        return {
            k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
        }

    return (
        sub("model.diffusion_model."),
        sub("first_stage_model."),
        sub("cond_stage_model."),
    )


# --------------------------------------------------------------------------- #
# CompVis pixel DDPM UNet
# --------------------------------------------------------------------------- #

_DDPM_DENSE_LEAVES = {"q", "k", "v", "proj_out", "nin_shortcut"}


def convert_ddpm_unet(sd: Flat) -> dict:
    """``models/ddpm/diffusion.py`` DDPM -> DDPMUNet params.

    Torch paths like ``down.0.block.1.conv1.weight`` become
    ``down_0_block_1 / conv1 / kernel``; ``temb.dense.0`` -> ``temb_dense_0``.
    """
    tree: dict = {}
    for key, w in sd.items():
        parts = key.split(".")
        torch_param = parts[-1]
        leaf = parts[-2]
        head = parts[:-2]
        if head and head[0] == "temb":  # temb.dense.0 -> temb_dense_0 (Dense)
            name = "_".join(head + [leaf])
            kind = "dense"
            path = (name,)
        elif not head:  # conv_in / norm_out / conv_out at top level
            name = leaf
            kind = _leaf_kind(leaf, w, _DDPM_DENSE_LEAVES, set())
            path = (name,)
        else:
            module = "_".join(head)
            kind = _leaf_kind(leaf, w, _DDPM_DENSE_LEAVES, set())
            # Conv/Dense leaves are named submodules; attn q/k/v are Dense
            if leaf == "temb_proj":
                kind = "dense"
            path = (module, leaf)
            if leaf == "conv" and head[-1] in ("downsample", "upsample"):
                path = (module, "conv")
        val = (
            _conv_kernel(w) if kind == "conv" and torch_param == "weight"
            else _dense_kernel(w) if kind == "dense" and torch_param == "weight"
            else w
        )
        _insert(tree, path + (_param_name(torch_param, kind),), val)
    return {"params": tree}


# --------------------------------------------------------------------------- #
# guided-diffusion family UNet (improved-DDPM pixel + LDM/SD openaimodel)
# --------------------------------------------------------------------------- #

_GD_DENSE_LEAVES = {
    "qkv", "proj_out", "skip_connection", "proj_in",
    "to_q", "to_k", "to_v", "proj",
}


def convert_gd_unet(sd: Flat) -> dict:
    """``improved_ddpm/unet.py`` / ``openaimodel.py`` UNetModel -> GDUNet.

    ``input_blocks.3.0.in_layers.0.weight`` -> ``input_blocks_3_0 /
    in_layers_0 / scale``; spatial-transformer subtrees keep their structure
    (``transformer_blocks.0.attn1.to_q`` -> ``transformer_blocks_0 / attn1 /
    to_q``); ``to_out.0`` -> ``to_out_0``; ff ``net.0.proj`` -> ``net_0/proj``.
    """
    tree: dict = {}
    for key, w in sd.items():
        parts = key.split(".")
        torch_param = parts[-1]
        if parts[0] in ("input_blocks", "output_blocks"):
            top = f"{parts[0]}_{parts[1]}_{parts[2]}"
            rest = parts[3:-1]
        elif parts[0] == "middle_block":
            top = f"middle_block_{parts[1]}"
            rest = parts[2:-1]
        elif parts[0] == "time_embed":
            top = f"time_embed_{parts[1]}"
            rest = []
        elif parts[0] == "out":
            top = f"out_{parts[1]}"
            rest = []
        elif parts[0] == "label_emb":
            top = "label_emb"
            rest = []
        else:
            raise KeyError(f"unmapped gd-unet key: {key}")

        if top.startswith("input_blocks_0_0") and not rest:
            kind = "conv"
            path = (top,)
        elif not rest:
            if top == "label_emb":
                kind = "embed"
            elif top.startswith("time_embed"):
                kind = "dense"
            elif top == "out_0":
                kind = "norm"
            elif top == "out_2":
                kind = "conv"
            else:
                raise KeyError(key)
            path = (top,)
        else:
            # normalize sub-path naming inside the layer
            sub = list(rest)
            # in_layers.0 -> in_layers_0 etc: merge numeric suffixes
            merged = []
            for p in sub:
                if p.isdigit() and merged:
                    merged[-1] = f"{merged[-1]}_{p}"
                else:
                    merged.append(p)
            leaf = merged[-1]
            kind = _leaf_kind(leaf.split("_")[0] if leaf[-1].isdigit() and "_" in leaf else leaf,
                              w, _GD_DENSE_LEAVES, set())
            # GroupNorms inside resblocks: in_layers_0 / out_layers_0
            if leaf in ("in_layers_0", "out_layers_0") and w.ndim == 1:
                kind = "norm"
            if leaf in ("in_layers_2", "out_layers_3"):
                kind = "conv"
            if leaf in ("emb_layers_1",):
                kind = "dense"
            if leaf in ("to_out_0", "net_2"):
                kind = "dense"
            if leaf == "op" or leaf == "conv":
                kind = "conv"
            path = (top, *merged)
        val = (
            _conv_kernel(w) if kind == "conv" and torch_param == "weight"
            else _dense_kernel(w) if kind == "dense" and torch_param == "weight"
            else w
        )
        _insert(tree, path + (_param_name(torch_param, kind),), val)
    return {"params": tree}


# --------------------------------------------------------------------------- #
# First-stage VAE / VQ
# --------------------------------------------------------------------------- #

_VAE_DENSE_LEAVES = {"q", "k", "v", "proj_out", "nin_shortcut"}


def _convert_ae_backbone(sd: Flat, tree: dict, prefix_out: str):
    for key, w in sd.items():
        parts = key.split(".")
        torch_param = parts[-1]
        leaf = parts[-2]
        head = parts[:-2]
        if not head:
            path = (prefix_out, leaf)
            kind = _leaf_kind(leaf, w, _VAE_DENSE_LEAVES, set())
        else:
            module = "_".join(head)
            kind = _leaf_kind(leaf, w, _VAE_DENSE_LEAVES, set())
            path = (prefix_out, module, leaf)
        val = (
            _conv_kernel(w) if kind == "conv" and torch_param == "weight"
            else _dense_kernel(w) if kind == "dense" and torch_param == "weight"
            else w
        )
        _insert(tree, path + (_param_name(torch_param, kind),), val)


def convert_vae(sd: Flat) -> dict:
    """AutoencoderKL / VQModel state (prefixes ``encoder.``, ``decoder.``,
    ``quant_conv.``, ``post_quant_conv.``, ``quantize.embedding``) ->
    AutoencoderKL / VQModel params."""
    tree: dict = {}
    enc = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    dec = {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")}
    _convert_ae_backbone(enc, tree, "encoder")
    _convert_ae_backbone(dec, tree, "decoder")
    for name in ("quant_conv", "post_quant_conv"):
        _insert(tree, (name, "kernel"), _dense_kernel(sd[f"{name}.weight"]))
        _insert(tree, (name, "bias"), sd[f"{name}.bias"])
    if "quantize.embedding.weight" in sd:
        _insert(tree, ("quantize", "embedding"), sd["quantize.embedding.weight"])
    return {"params": tree}


# --------------------------------------------------------------------------- #
# HF CLIP text model (SD cond stage)
# --------------------------------------------------------------------------- #


def convert_clip_text(sd: Flat) -> dict:
    """``cond_stage_model.`` subtree (HF CLIPTextModel) -> CLIPTextEncoder.

    Accepts keys with or without the leading ``transformer.text_model.``.
    """
    tree: dict = {}
    for key, w in sd.items():
        k = key
        for p in ("transformer.", "text_model."):
            if k.startswith(p):
                k = k[len(p):]
        if k == "embeddings.token_embedding.weight":
            _insert(tree, ("token_embedding", "embedding"), w)
        elif k == "embeddings.position_embedding.weight":
            _insert(tree, ("position_embedding",), w)
        elif k == "embeddings.position_ids":
            continue
        elif k.startswith("final_layer_norm."):
            p = k.split(".")[-1]
            _insert(tree, ("final_layer_norm", _param_name(p, "norm")), w)
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i = parts[2]
            rest = parts[3:]
            if rest[0] == "self_attn":
                leaf, p = rest[1], rest[2]
            elif rest[0] == "mlp":
                leaf, p = rest[1], rest[2]
            else:  # layer_norm1 / layer_norm2
                leaf, p = rest[0], rest[1]
            kind = "norm" if leaf.startswith("layer_norm") else "dense"
            val = _dense_kernel(w) if kind == "dense" and p == "weight" else w
            _insert(tree, (f"layers_{i}", leaf, _param_name(p, kind)), val)
        else:
            raise KeyError(f"unmapped clip-text key: {key}")
    return {"params": tree}


# --------------------------------------------------------------------------- #
# LDM BERT (x-transformer) text encoder
# --------------------------------------------------------------------------- #


def convert_ldm_bert(sd: Flat) -> dict:
    """``cond_stage_model.transformer.`` (x_transformer TransformerWrapper)
    -> LDMBertEncoder params.  Torch layers alternate [attn, ff]:
    ``attn_layers.layers.{2j}.{0,1}`` -> attn_norm_j / attn_j,
    ``attn_layers.layers.{2j+1}.{0,1}`` -> ff_norm_j / ff_in_j / ff_out_j.
    """
    tree: dict = {}
    for key, w in sd.items():
        k = key
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        if k == "token_emb.weight":
            _insert(tree, ("token_emb", "embedding"), w)
        elif k == "pos_emb.emb.weight":
            _insert(tree, ("pos_emb",), w)
        elif k.startswith("norm."):
            _insert(tree, ("norm", _param_name(k.split(".")[-1], "norm")), w)
        elif k.startswith("to_logits."):
            continue  # unused (return_embeddings=True)
        elif k.startswith("attn_layers.layers."):
            parts = k.split(".")
            li = int(parts[2])
            slot = parts[3]       # 0 = norm, 1 = block
            j, is_ff = li // 2, li % 2 == 1
            rest = parts[4:]
            p = rest[-1]
            if slot == "0":
                name = f"ff_norm_{j}" if is_ff else f"attn_norm_{j}"
                _insert(tree, (name, _param_name(p, "norm")), w)
            elif not is_ff:
                leaf = rest[0]    # to_q/to_k/to_v/to_out
                val = _dense_kernel(w) if p == "weight" else w
                _insert(tree, (f"attn_{j}", leaf, _param_name(p, "dense")), val)
            else:
                # FeedForward: net.0.0 (Linear) -> ff_in, net.2 -> ff_out
                sub = ".".join(rest[:-1])
                name = {"net.0.0": f"ff_in_{j}", "net.2": f"ff_out_{j}"}[sub]
                val = _dense_kernel(w) if p == "weight" else w
                _insert(tree, (name, _param_name(p, "dense")), val)
        else:
            raise KeyError(f"unmapped ldm-bert key: {key}")
    return {"params": tree}


# --------------------------------------------------------------------------- #
# OpenAI CLIP (scoring model, image + text towers)
# --------------------------------------------------------------------------- #


def _convert_resblock(tree, top, i, rest, w):
    p = rest[-1]
    if rest[0] == "attn":
        if rest[1] in ("in_proj_weight", "in_proj_bias"):
            name = "kernel" if rest[1].endswith("weight") else "bias"
            val = w.T if name == "kernel" else w
            _insert(tree, (top, f"resblocks_{i}", "in_proj", name), val)
            return
        leaf = rest[1]  # out_proj
        val = _dense_kernel(w) if p == "weight" else w
        _insert(tree, (top, f"resblocks_{i}", leaf, _param_name(p, "dense")), val)
    elif rest[0] in ("ln_1", "ln_2"):
        _insert(tree, (top, f"resblocks_{i}", rest[0], _param_name(p, "norm")), w)
    elif rest[0] == "mlp":
        leaf = rest[1]  # c_fc / c_proj
        val = _dense_kernel(w) if p == "weight" else w
        _insert(tree, (top, f"resblocks_{i}", leaf, _param_name(p, "dense")), val)
    else:
        raise KeyError(rest)


def convert_openai_clip(sd: Flat) -> dict:
    """OpenAI ``ViT-B-32.pt`` state_dict -> CLIPModel params."""
    tree: dict = {}
    for key, w in sd.items():
        parts = key.split(".")
        if key == "logit_scale":
            continue  # scoring uses cosine similarity only (clean_clip.py:33-39)
        if parts[0] == "visual":
            if parts[1] == "conv1":
                _insert(tree, ("visual", "conv1", "kernel"), _conv_kernel(w))
            elif parts[1] == "class_embedding":
                _insert(tree, ("visual", "class_embedding"), w)
            elif parts[1] == "positional_embedding":
                _insert(tree, ("visual", "positional_embedding"), w)
            elif parts[1] == "proj":
                _insert(tree, ("visual", "proj"), w)
            elif parts[1] in ("ln_pre", "ln_post"):
                _insert(tree, ("visual", parts[1], _param_name(parts[2], "norm")), w)
            elif parts[1] == "transformer":
                _convert_resblock(tree, "visual", parts[3], parts[4:], w)
            else:
                raise KeyError(key)
        elif parts[0] == "token_embedding":
            _insert(tree, ("text", "token_embedding", "embedding"), w)
        elif parts[0] == "positional_embedding":
            _insert(tree, ("text", "positional_embedding"), w)
        elif parts[0] == "text_projection":
            _insert(tree, ("text", "text_projection"), w)
        elif parts[0] == "ln_final":
            _insert(tree, ("text", "ln_final", _param_name(parts[1], "norm")), w)
        elif parts[0] == "transformer":
            _convert_resblock(tree, "text", parts[2], parts[3:], w)
        else:
            raise KeyError(f"unmapped clip key: {key}")
    return {"params": tree}
