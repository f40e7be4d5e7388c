"""Torch-checkpoint <-> JAX-pytree conversion with head grafting.

Covers the reference's exact `state_dict` namespace (reference
vilt/modules/vilt_module.py:20-250):

  text_embeddings.{word,position,token_type}_embeddings.weight,
  text_embeddings.LayerNorm.{weight,bias}
  token_type_embeddings.weight
  transformer.{cls_token,pos_embed,mask_token,norm.*,
               patch_embed.proj.{weight,bias},
               blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}.*}
  pooler.dense.*      mlm_score.{transform.*,decoder.weight,bias}
  itm_score.fc.*      mpp_score.{transform.*,decoder.*}
  vqa_classifier.{0,1,3}.*   nlvr2_classifier.{0,1,3}.*   rank_output.*
  moco_head.projector.{0,1,3}.*
  barlowtwins_head.{projector.{0,1,3,4,6}.*,norm.*}
  k_* momentum twins, proj_queue, proj_queue_ptr buffers

Layout transforms:
  * torch Linear (out,in) -> JAX kernel (in,out)            [transpose]
  * conv patch-embed (C,3,P,P) -> matmul kernel (P*P*3,C) in (ph,pw,ch)
    flat order matching rmcl_tpu.models.vit.patchify
  * per-layer blocks.{i} -> stacked leading-dim-L pytree (lax.scan layout)
  * pos_embed grid mismatch -> bilinear resize of the spatial part
    (reference vision_transformer.py checkpoint_filter_fn:854-922)
  * NLVR2: token_type_embeddings row 2 initialised from row 1 when the
    checkpoint has 2 rows but the model needs 3 (vilt_module.py:201-206)

Head grafting (vilt_module.py:134-160 train / :256-268 test): MLM/ITM
head weights are overwritten from `vilt_200k_mlm_itm` before load.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from rmcl_tpu.core.config import RMCLConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _ln(sd, name):
    return {"weight": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def _emb(sd, name):
    return {"weight": _np(sd[f"{name}.weight"])}


def _bn(sd, name, affine=True):
    out = {"running_mean": _np(sd[f"{name}.running_mean"]),
           "running_var": _np(sd[f"{name}.running_var"])}
    if affine and f"{name}.weight" in sd:
        out["weight"] = _np(sd[f"{name}.weight"])
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def resize_pos_embed(pos: np.ndarray, n_new: int) -> np.ndarray:
    """(1, 1+S*S, C) -> (1, 1+n*n, C) bilinear on the spatial grid
    (reference vision_transformer.py:854-872)."""
    n_tok = pos.shape[1] - 1
    s_old = int(round(n_tok ** 0.5))
    s_new = int(round(n_new ** 0.5))
    if s_old * s_old == n_tok and s_old == s_new:
        return pos
    import jax
    cls, grid = pos[:, :1], pos[:, 1:]
    grid = grid.reshape(1, s_old, s_old, -1)
    grid = np.asarray(jax.image.resize(
        grid, (1, s_new, s_new, grid.shape[-1]), method="bilinear"))
    return np.concatenate([cls, grid.reshape(1, s_new * s_new, -1)], axis=1)


# ---------------------------------------------------------------- modules
def _convert_text_embeddings(sd, p: str):
    return {
        "word_embeddings": _emb(sd, f"{p}word_embeddings"),
        "position_embeddings": _emb(sd, f"{p}position_embeddings"),
        "token_type_embeddings": _emb(sd, f"{p}token_type_embeddings"),
        "LayerNorm": _ln(sd, f"{p}LayerNorm"),
    }


def _convert_transformer(sd, p: str, num_layers: int):
    conv_w = _np(sd[f"{p}patch_embed.proj.weight"])       # (C, 3, P, P)
    C = conv_w.shape[0]
    # -> (P, P, 3, C) -> flat (ph, pw, ch) rows
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, C)

    blocks = []
    for i in range(num_layers):
        b = f"{p}blocks.{i}."
        blocks.append({
            "norm1": _ln(sd, f"{b}norm1"),
            "attn": {"qkv": _linear(sd, f"{b}attn.qkv"),
                     "proj": _linear(sd, f"{b}attn.proj")},
            "norm2": _ln(sd, f"{b}norm2"),
            "mlp": {"fc1": _linear(sd, f"{b}mlp.fc1"),
                    "fc2": _linear(sd, f"{b}mlp.fc2")},
        })
    import jax
    import jax.numpy as jnp
    stacked = jax.tree.map(lambda *xs: jnp.stack(
        [jnp.asarray(x) for x in xs]), *blocks)

    out = {
        "patch_embed": {"proj": {
            "kernel": kernel,
            "bias": _np(sd[f"{p}patch_embed.proj.bias"])}},
        "cls_token": _np(sd[f"{p}cls_token"]),
        "pos_embed": _np(sd[f"{p}pos_embed"]),
        "blocks": stacked,
        "norm": _ln(sd, f"{p}norm"),
    }
    if f"{p}mask_token" in sd:
        out["mask_token"] = _np(sd[f"{p}mask_token"]).reshape(-1)
    else:
        out["mask_token"] = np.zeros((C,), np.float32)
    return out


def _convert_mlm_head(sd, p: str):
    return {
        "transform": {
            "dense": _linear(sd, f"{p}transform.dense"),
            "LayerNorm": _ln(sd, f"{p}transform.LayerNorm"),
        },
        "decoder": {"kernel": _np(sd[f"{p}decoder.weight"]).T},
        "bias": _np(sd[f"{p}bias"]),
    }


def _convert_mpp_head(sd, p: str):
    return {
        "transform": {
            "dense": _linear(sd, f"{p}transform.dense"),
            "LayerNorm": _ln(sd, f"{p}transform.LayerNorm"),
        },
        "decoder": _linear(sd, f"{p}decoder"),
    }


def _convert_seq_classifier(sd, p: str):
    return {"0": _linear(sd, f"{p}0"),
            "1": _ln(sd, f"{p}1"),
            "3": _linear(sd, f"{p}3")}


def _convert_moco_head(sd, p: str):
    return {"projector": {
        "0": _linear(sd, f"{p}projector.0"),
        "1": _ln(sd, f"{p}projector.1"),
        "3": _linear(sd, f"{p}projector.3"),
    }}


def _convert_bt_head(sd, p: str):
    return {
        "projector": {
            "0": _linear(sd, f"{p}projector.0"),
            "1": _bn(sd, f"{p}projector.1"),
            "3": _linear(sd, f"{p}projector.3"),
            "4": _bn(sd, f"{p}projector.4"),
            "6": _linear(sd, f"{p}projector.6"),
        },
        "norm": _bn(sd, f"{p}norm", affine=False),
    }


def _has(sd, prefix: str) -> bool:
    return any(k.startswith(prefix) for k in sd)


# ------------------------------------------------------------------- main
def convert_state_dict(sd: Dict[str, Any], cfg: RMCLConfig
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch state_dict -> (params, state) pytrees for rmcl_tpu ViLT."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    for prefix in ("", "k_"):
        te = f"{prefix}text_embeddings."
        if _has(sd, te):
            params[f"{prefix}text_embeddings"] = \
                _convert_text_embeddings(sd, te)
        tt = f"{prefix}token_type_embeddings."
        if _has(sd, tt):
            tte = _np(sd[f"{tt}weight"])
            needs3 = (cfg.loss_names.get("nlvr2", 0) > 0
                      or cfg.loss_names.get("nlvr2_attacked", 0) > 0)
            if needs3 and tte.shape[0] == 2:
                tte = np.concatenate([tte, tte[1:2]], axis=0)
            params[f"{prefix}token_type_embeddings"] = {"weight": tte}
        tr = f"{prefix}transformer."
        if _has(sd, tr):
            conv = _convert_transformer(sd, tr, cfg.num_layers)
            n_model = (cfg.image_size // cfg.patch_size) ** 2 + 1
            if conv["pos_embed"].shape[1] != n_model:
                conv["pos_embed"] = resize_pos_embed(
                    conv["pos_embed"], n_model - 1)
            params[f"{prefix}transformer"] = conv
        mh = f"{prefix}moco_head."
        if _has(sd, mh):
            params[f"{prefix}moco_head"] = _convert_moco_head(sd, mh)

    if _has(sd, "pooler."):
        params["pooler"] = {"dense": _linear(sd, "pooler.dense")}
    if _has(sd, "mlm_score."):
        params["mlm_score"] = _convert_mlm_head(sd, "mlm_score.")
    if _has(sd, "itm_score."):
        params["itm_score"] = {"fc": _linear(sd, "itm_score.fc")}
    if _has(sd, "mpp_score."):
        params["mpp_score"] = _convert_mpp_head(sd, "mpp_score.")
    if _has(sd, "vqa_classifier."):
        params["vqa_classifier"] = _convert_seq_classifier(
            sd, "vqa_classifier.")
    if _has(sd, "nlvr2_classifier."):
        params["nlvr2_classifier"] = _convert_seq_classifier(
            sd, "nlvr2_classifier.")
    if _has(sd, "rank_output."):
        params["rank_output"] = _linear(sd, "rank_output")
    if _has(sd, "barlowtwins_head."):
        params["barlowtwins_head"] = _convert_bt_head(
            sd, "barlowtwins_head.")

    if "proj_queue" in sd:
        state["proj_queue"] = _np(sd["proj_queue"])
        ptr = _np(sd.get("proj_queue_ptr", np.zeros((), np.int32)))
        state["proj_queue_ptr"] = np.asarray(ptr, np.int32).reshape(())

    import jax.numpy as jnp
    params = __import__("jax").tree.map(jnp.asarray, params)
    state = __import__("jax").tree.map(jnp.asarray, state)
    return params, state


def graft_pretrain_heads(sd: Dict[str, Any], pretrain_sd: Dict[str, Any],
                         loss_names: Dict[str, float]) -> Dict[str, Any]:
    """Overwrite MLM/ITM head weights from the pretrain checkpoint
    (reference vilt_module.py:134-160, :256-268)."""
    sd = dict(sd)
    if loss_names.get("mlm", 0) > 0:
        for k in ("mlm_score.bias",
                  "mlm_score.transform.dense.weight",
                  "mlm_score.transform.dense.bias",
                  "mlm_score.transform.LayerNorm.weight",
                  "mlm_score.transform.LayerNorm.bias",
                  "mlm_score.decoder.weight"):
            sd[k] = pretrain_sd[k]
    if loss_names.get("itm", 0) > 0:
        sd["itm_score.fc.weight"] = pretrain_sd["itm_score.fc.weight"]
        sd["itm_score.fc.bias"] = pretrain_sd["itm_score.fc.bias"]
    return sd


def load_torch_checkpoint(path: str, cfg: RMCLConfig,
                          pretrain_head_path: Optional[str] = None
                          ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch.load the .ckpt, optionally graft heads, convert."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    if pretrain_head_path:
        ckpt2 = torch.load(pretrain_head_path, map_location="cpu",
                           weights_only=False)
        sd = graft_pretrain_heads(sd, ckpt2.get("state_dict", ckpt2),
                                  cfg.loss_names)
    return convert_state_dict(sd, cfg)


# ------------------------------------------------------------------ export
def export_state_dict(params: Dict[str, Any], state: Dict[str, Any],
                      num_layers: int) -> Dict[str, np.ndarray]:
    """Inverse conversion: rmcl_tpu pytrees -> reference-named torch-style
    state dict (numpy values, torch layouts).  Enables reference-side
    evaluation of TPU-trained checkpoints."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(name, p):
        sd[f"{name}.weight"] = _np(p["kernel"]).T
        if "bias" in p:
            sd[f"{name}.bias"] = _np(p["bias"])

    def put_ln(name, p):
        sd[f"{name}.weight"] = _np(p["weight"])
        sd[f"{name}.bias"] = _np(p["bias"])

    def put_bn(name, p):
        sd[f"{name}.running_mean"] = _np(p["running_mean"])
        sd[f"{name}.running_var"] = _np(p["running_var"])
        if "weight" in p:
            put_ln(name, p)

    for prefix in ("", "k_"):
        key = f"{prefix}text_embeddings"
        if key in params:
            te = params[key]
            for sub in ("word_embeddings", "position_embeddings",
                        "token_type_embeddings"):
                sd[f"{key}.{sub}.weight"] = _np(te[sub]["weight"])
            put_ln(f"{key}.LayerNorm", te["LayerNorm"])
        key = f"{prefix}token_type_embeddings"
        if key in params:
            sd[f"{key}.weight"] = _np(params[key]["weight"])
        key = f"{prefix}transformer"
        if key in params:
            tr = params[key]
            C = _np(tr["patch_embed"]["proj"]["kernel"]).shape[1]
            P = int(round((_np(tr["patch_embed"]["proj"]["kernel"]).shape[0]
                           / 3) ** 0.5))
            sd[f"{key}.patch_embed.proj.weight"] = _np(
                tr["patch_embed"]["proj"]["kernel"]).reshape(
                    P, P, 3, C).transpose(3, 2, 0, 1)
            sd[f"{key}.patch_embed.proj.bias"] = _np(
                tr["patch_embed"]["proj"]["bias"])
            sd[f"{key}.cls_token"] = _np(tr["cls_token"])
            sd[f"{key}.pos_embed"] = _np(tr["pos_embed"])
            sd[f"{key}.mask_token"] = _np(tr["mask_token"]).reshape(1, 1, -1)
            put_ln(f"{key}.norm", tr["norm"])
            for i in range(num_layers):
                b = __import__("jax").tree.map(lambda x: _np(x)[i],
                                               tr["blocks"])
                put_ln(f"{key}.blocks.{i}.norm1", b["norm1"])
                put_linear(f"{key}.blocks.{i}.attn.qkv", b["attn"]["qkv"])
                put_linear(f"{key}.blocks.{i}.attn.proj", b["attn"]["proj"])
                put_ln(f"{key}.blocks.{i}.norm2", b["norm2"])
                put_linear(f"{key}.blocks.{i}.mlp.fc1", b["mlp"]["fc1"])
                put_linear(f"{key}.blocks.{i}.mlp.fc2", b["mlp"]["fc2"])
        key = f"{prefix}moco_head"
        if key in params:
            for j in ("0", "3"):
                put_linear(f"{key}.projector.{j}",
                           params[key]["projector"][j])
            put_ln(f"{key}.projector.1", params[key]["projector"]["1"])

    if "pooler" in params:
        put_linear("pooler.dense", params["pooler"]["dense"])
    if "mlm_score" in params:
        m = params["mlm_score"]
        put_linear("mlm_score.transform.dense", m["transform"]["dense"])
        put_ln("mlm_score.transform.LayerNorm", m["transform"]["LayerNorm"])
        sd["mlm_score.decoder.weight"] = _np(m["decoder"]["kernel"]).T
        sd["mlm_score.bias"] = _np(m["bias"])
    if "itm_score" in params:
        put_linear("itm_score.fc", params["itm_score"]["fc"])
    if "mpp_score" in params:
        m = params["mpp_score"]
        put_linear("mpp_score.transform.dense", m["transform"]["dense"])
        put_ln("mpp_score.transform.LayerNorm", m["transform"]["LayerNorm"])
        put_linear("mpp_score.decoder", m["decoder"])
    for name in ("vqa_classifier", "nlvr2_classifier"):
        if name in params:
            for j in ("0", "3"):
                put_linear(f"{name}.{j}", params[name][j])
            put_ln(f"{name}.1", params[name]["1"])
    if "rank_output" in params:
        put_linear("rank_output", params["rank_output"])
    if "barlowtwins_head" in params:
        bt = params["barlowtwins_head"]
        for j in ("0", "3", "6"):
            put_linear(f"barlowtwins_head.projector.{j}",
                       bt["projector"][j])
        for j in ("1", "4"):
            put_bn(f"barlowtwins_head.projector.{j}", bt["projector"][j])
        put_bn("barlowtwins_head.norm", bt["norm"])

    if "proj_queue" in state:
        sd["proj_queue"] = _np(state["proj_queue"])
        sd["proj_queue_ptr"] = _np(state["proj_queue_ptr"]).reshape(1)
    return sd


def load_timm_vit(sd: Dict[str, Any], cfg: RMCLConfig) -> Dict[str, Any]:
    """Adapt a bare timm VisionTransformer state dict (keys like
    `cls_token`, `blocks.0.attn.qkv.weight` — no `transformer.` prefix)
    into rmcl_tpu transformer params.  Covers the reference's ImageNet
    init path (timm load_pretrained + checkpoint_filter_fn, reference
    vision_transformer.py:854-922): linear-format patch embeddings are
    reshaped to conv layout first, pos-embed grids resized."""
    sd = {k: _np(v) for k, v in sd.items()}
    pe = sd.get("patch_embed.proj.weight")
    if pe is not None and pe.ndim == 2:
        # linear (C, P*P*3) -> conv (C, 3, P, P) (checkpoint_filter_fn :915)
        C = pe.shape[0]
        P = cfg.patch_size
        sd["patch_embed.proj.weight"] = pe.reshape(C, 3, P, P)
    prefixed = {f"transformer.{k}": v for k, v in sd.items()}
    conv = _convert_transformer(prefixed, "transformer.", cfg.num_layers)
    n_model = (cfg.image_size // cfg.patch_size) ** 2 + 1
    if conv["pos_embed"].shape[1] != n_model:
        conv["pos_embed"] = resize_pos_embed(conv["pos_embed"], n_model - 1)
    import jax
    import jax.numpy as jnp
    return jax.tree.map(jnp.asarray, conv)
