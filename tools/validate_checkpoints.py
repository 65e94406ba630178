"""First-contact checkpoint validation kit.

Walks a tree of published checkpoints, detects each component family from
its own tensor names, sniffs the structural config from tensor shapes, runs
the matching converter on the real tensors, structurally compares the
converted tree against ``init_*_params`` (via ``jax.eval_shape`` — zero
device memory), and optionally (--forward) runs a 2-step denoise/forward
smoke per DiT family plus encode/decode smokes for text encoders and VAEs.

The reference's weights-day flow hardcodes one repo layout per adapter
(e.g. ``MagCache4Wan2.1/magcache_generate.py`` t5_checkpoint/vae_checkpoint
args); this tool makes day-one contact with ALL of them a checklist:

    python tools/validate_checkpoints.py /path/to/checkpoints \
        --forward --report validate_report.json

Layouts understood per directory (recursively): any directory directly
containing ``*.safetensors`` / ``*.pth`` / ``*.pt`` / ``*.bin`` is loaded
with `load_safetensors_dir` (sharded HF dirs merge; wan-style mixed dirs
keep only the DiT) and classified by key signatures below. CI drives this
tool against synthetic reference-named trees (tests/test_validate_checkpoints
.py) so the real-weights run is a checklist, not a debugging session.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import traceback
from typing import Callable, Dict, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _pick_head_dim(d, preferred):
    """Head count is not recorded in checkpoints (weights are head-agnostic);
    prefer the family's published head_dim, else the largest standard one
    dividing the hidden dim — conversion and shape-matching are exact either
    way, and published configs hit the preferred branch."""
    if d % preferred == 0 and d // preferred > 0:
        return preferred
    for hd in (128, 96, 72, 64, 48, 32, 16, 8, 4):
        if d % hd == 0:
            return hd
    return d


def _max_idx(keys, prefix):
    idx = [int(k[len(prefix):].split(".")[0]) for k in keys
           if k.startswith(prefix) and k[len(prefix):].split(".")[0].isdigit()]
    return (max(idx) + 1) if idx else 0


# --------------------------------------------------------------------------
# per-family sniffers: structural config from the checkpoint's own shapes
# --------------------------------------------------------------------------

def sniff_wan(sd):
    from magcache_tpu.models.wan import WanConfig
    d, cin = sd["patch_embedding.weight"].shape[:2]
    L = _max_idx(sd, "blocks.")
    has_clip = "blocks.0.cross_attn.k_img.weight" in sd
    head_dim = _pick_head_dim(d, 128)    # 128 across Wan2.1/2.2 sizes
    return WanConfig(
        dim=d, ffn_dim=sd["blocks.0.ffn.0.weight"].shape[0],
        heads=d // head_dim, layers=L,
        freq_dim=sd["time_embedding.0.weight"].shape[1],
        text_dim=sd["text_embedding.0.weight"].shape[1],
        in_channels=cin, out_channels=sd["head.head.weight"].shape[0] // 4,
        model_type=("i2v" if has_clip else "t2v"))


def sniff_flux(sd):
    from magcache_tpu.models.flux import FluxConfig
    d = sd["img_in.weight"].shape[0]
    hd = sd["double_blocks.0.img_attn.norm.query_norm.scale"].shape[0]
    ax = (hd * 16 // 128, hd * 56 // 128, hd * 56 // 128)
    if sum(ax) != hd:
        ax = (hd - 2 * (hd * 56 // 128), hd * 56 // 128, hd * 56 // 128)
    return FluxConfig(
        in_channels=sd["img_in.weight"].shape[1], hidden=d, heads=d // hd,
        depth_double=_max_idx(sd, "double_blocks."),
        depth_single=_max_idx(sd, "single_blocks."),
        text_dim=sd["txt_in.weight"].shape[1],
        vec_dim=sd["vector_in.in_layer.weight"].shape[1],
        axes_dims=ax, guidance_embed="guidance_in.in_layer.weight" in sd,
        time_embed_dim=sd["time_in.in_layer.weight"].shape[1])


def sniff_hunyuan(sd):
    from magcache_tpu.models.hunyuan import HunyuanConfig
    for pre in ("model.", "module."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}
    d = sd["img_in.proj.weight"].shape[0]
    hd = sd["single_blocks.0.q_norm.weight"].shape[0]
    ax = (hd * 16 // 128, hd * 56 // 128, hd * 56 // 128)
    return HunyuanConfig(
        in_channels=sd["img_in.proj.weight"].shape[1], hidden=d,
        heads=d // hd, depth_double=_max_idx(sd, "double_blocks."),
        depth_single=_max_idx(sd, "single_blocks."),
        refiner_depth=_max_idx(sd, "txt_in.individual_token_refiner.blocks."),
        text_dim=sd["txt_in.input_embedder.weight"].shape[1],
        vec_dim=sd["vector_in.in_layer.weight"].shape[1], axes_dims=ax,
        guidance_embed="guidance_in.mlp.0.weight" in sd,
        time_embed_dim=sd["time_in.mlp.0.weight"].shape[1])


def sniff_qwen_image(sd):
    from magcache_tpu.models.qwen_image import QwenImageConfig
    d = sd["img_in.weight"].shape[0]
    hd = sd["transformer_blocks.0.attn.norm_q.weight"].shape[0]
    ax = (hd * 16 // 128, hd * 56 // 128, hd * 56 // 128)
    return QwenImageConfig(
        in_channels=sd["img_in.weight"].shape[1], hidden=d, heads=d // hd,
        depth=_max_idx(sd, "transformer_blocks."),
        text_dim=sd["txt_in.weight"].shape[1], axes_dims=ax,
        time_embed_dim=sd[
            "time_text_embed.timestep_embedder.linear_1.weight"].shape[1])


def sniff_cogvideox(sd):
    from magcache_tpu.models.cogvideox import CogVideoXConfig
    pw = sd["patch_embed.proj.weight"]
    d = pw.shape[0]
    hd = (sd["transformer_blocks.0.attn1.norm_q.weight"].shape[0]
          if "transformer_blocks.0.attn1.norm_q.weight" in sd
          else _pick_head_dim(d, 64))
    temb = 0
    if "patch_embed.pos_embedding" not in sd and \
            "transformer_blocks.0.norm1.linear.weight" in sd:
        temb = sd["transformer_blocks.0.norm1.linear.weight"].shape[1]
    kw = dict(hidden=d, heads=d // hd,
              layers=_max_idx(sd, "transformer_blocks."),
              in_channels=pw.shape[1], patch=pw.shape[2],
              text_dim=sd["patch_embed.text_proj.weight"].shape[1],
              time_embed_dim=sd["time_embedding.linear_1.weight"].shape[1])
    try:
        return CogVideoXConfig(temb_dim=temb, **kw)
    except TypeError:
        return CogVideoXConfig(**kw)


def sniff_stdit3(sd):
    from magcache_tpu.models.stdit3 import STDiT3Config
    pw = sd["x_embedder.proj.weight"]
    hd = (sd["spatial_blocks.0.attn.q_norm.weight"].shape[0]
          if "spatial_blocks.0.attn.q_norm.weight" in sd
          else _pick_head_dim(pw.shape[0], 72))
    return STDiT3Config(
        hidden=pw.shape[0], heads=pw.shape[0] // hd,
        depth=_max_idx(sd, "spatial_blocks."), in_channels=pw.shape[1],
        caption_dim=sd["y_embedder.y_embedding"].shape[1],
        patch=tuple(pw.shape[2:]),
        freq_dim=sd["t_embedder.mlp.0.weight"].shape[1],
        caption_max_len=sd["y_embedder.y_embedding"].shape[0],
        qk_norm="spatial_blocks.0.attn.q_norm.weight" in sd)


def sniff_latte(sd):
    from magcache_tpu.models.latte import LatteConfig
    pw = sd["pos_embed.proj.weight"]
    d = pw.shape[0]
    p = pw.shape[2]
    return LatteConfig(
        hidden=d, heads=d // _pick_head_dim(d, 72), depth=_max_idx(sd, "transformer_blocks."),
        in_channels=pw.shape[1], patch=p,
        out_channels=sd["proj_out.weight"].shape[0] // (p * p),
        caption_dim=sd["caption_projection.linear_1.weight"].shape[1],
        time_embed_dim=sd[
            "adaln_single.emb.timestep_embedder.linear_1.weight"].shape[1])


def sniff_vchitect(sd):
    from magcache_tpu.models.vchitect import VchitectConfig
    pw = sd["pos_embed.proj.weight"]
    d = pw.shape[0]
    return VchitectConfig(
        hidden=d, heads=d // _pick_head_dim(d, 64), depth=_max_idx(sd, "transformer_blocks."),
        in_channels=pw.shape[1], patch=pw.shape[2],
        text_dim=sd["context_embedder.weight"].shape[1],
        vec_dim=sd["time_text_embed.text_embedder.linear_1.weight"].shape[1],
        time_embed_dim=sd[
            "time_text_embed.timestep_embedder.linear_1.weight"].shape[1])


def sniff_osp(sd):
    from magcache_tpu.models.open_sora_plan import OpenSoraPlanConfig
    pw = sd["pos_embed.proj.weight"]
    d = pw.shape[0]
    return OpenSoraPlanConfig(
        hidden=d, heads=d // _pick_head_dim(d, 72), depth=_max_idx(sd, "transformer_blocks."),
        in_channels=pw.shape[1],
        out_channels=sd["proj_out.weight"].shape[0] // 4,
        caption_dim=sd["caption_projection.linear_1.weight"].shape[1],
        time_embed_dim=sd[
            "adaln_single.emb.timestep_embedder.linear_1.weight"].shape[1])


# --------------------------------------------------------------------------
# forward smokes (--forward): 2 denoise forwards at a minimal latent grid
# --------------------------------------------------------------------------

def _dit_forward(core, params, x, cond, dtype_note=""):
    import jax
    import jax.numpy as jnp
    for tv in (999.0, 500.0):
        t = jnp.full((x.shape[0],), tv, jnp.float32)
        h, ctx = core.prepare(params, x, t, cond)
        out = core.head(params, core.trunk(params, h, ctx), ctx)
        if not np.isfinite(np.asarray(out, np.float32)).all():
            raise ValueError(f"non-finite output at t={tv}{dtype_note}")
    return tuple(out.shape)


def fwd_wan(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.wan import make_wan_core
    core = make_wan_core(cfg, (2, 4, 4))
    x = jnp.ones((1, 2, 8, 8, cfg.in_channels), jnp.float32) * 0.1
    cond = {"context": jnp.ones((1, cfg.text_len, cfg.text_dim),
                                jnp.float32) * 0.01}
    if cfg.model_type == "i2v":
        cond["clip_fea"] = jnp.ones((1, cfg.clip_tokens, cfg.clip_dim),
                                    jnp.float32) * 0.01
        x = jnp.concatenate(
            [x, jnp.zeros((1, 2, 8, 8, 20), jnp.float32)], axis=-1) \
            if cfg.in_channels == 36 else x
    return _dit_forward(core, params, x, cond)


def fwd_flux(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.flux import make_flux_core
    core = make_flux_core(cfg, 8, 4, 4)
    x = jnp.ones((1, 16, cfg.in_channels), jnp.float32) * 0.1
    cond = {"txt": jnp.ones((1, 8, cfg.text_dim), jnp.float32) * 0.01,
            "vec": jnp.ones((1, cfg.vec_dim), jnp.float32) * 0.01,
            "guidance": jnp.full((1,), 3.5)}
    return _dit_forward(core, params, x, cond)


def fwd_hunyuan(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.hunyuan import make_hunyuan_core
    core = make_hunyuan_core(cfg, 8, (2, 4, 4))
    x = jnp.ones((1, 2, 8, 8, cfg.in_channels), jnp.float32) * 0.1
    cond = {"txt": jnp.ones((1, 8, cfg.text_dim), jnp.float32) * 0.01,
            "txt_mask": jnp.ones((1, 8), jnp.float32),
            "vec": jnp.ones((1, cfg.vec_dim), jnp.float32) * 0.01,
            "guidance": jnp.full((1,), 6.0)}
    return _dit_forward(core, params, x, cond)


def fwd_qwen(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.qwen_image import make_qwen_image_core
    core = make_qwen_image_core(cfg, 8, 4, 4)
    x = jnp.ones((1, 16, cfg.in_channels), jnp.float32) * 0.1
    cond = {"txt": jnp.ones((1, 8, cfg.text_dim), jnp.float32) * 0.01,
            "txt_mask": jnp.ones((1, 8), jnp.float32)}
    return _dit_forward(core, params, x, cond)


def fwd_cogvideox(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.cogvideox import make_cogvideox_core
    core = make_cogvideox_core(cfg, 8, (2, 4, 4))
    x = jnp.ones((1, 2, 8 * cfg.patch, 8 * cfg.patch, cfg.in_channels),
                 jnp.float32) * 0.1
    cond = {"txt": jnp.ones((1, 8, cfg.text_dim), jnp.float32) * 0.01}
    return _dit_forward(core, params, x, cond)


def fwd_stdit3(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.stdit3 import make_stdit3_core
    pt, ph, pw = cfg.patch
    core = make_stdit3_core(cfg, (2, 4, 4), cfg.caption_max_len)
    x = jnp.ones((1, 2 * pt, 4 * ph, 4 * pw, cfg.in_channels),
                 jnp.float32) * 0.1
    cond = {"y": jnp.ones((1, cfg.caption_max_len, cfg.caption_dim),
                          jnp.float32) * 0.01}
    return _dit_forward(core, params, x, cond)


def fwd_latte(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.latte import make_latte_core
    core = make_latte_core(cfg, (2, 4, 4), 8)
    x = jnp.ones((1, 2, 4 * cfg.patch, 4 * cfg.patch, cfg.in_channels),
                 jnp.float32) * 0.1
    cond = {"y": jnp.ones((1, 8, cfg.caption_dim), jnp.float32) * 0.01}
    return _dit_forward(core, params, x, cond)


def fwd_vchitect(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.vchitect import make_vchitect_core
    core = make_vchitect_core(cfg, (2, 4, 4), 8)
    x = jnp.ones((1, 2, 4 * cfg.patch, 4 * cfg.patch, cfg.in_channels),
                 jnp.float32) * 0.1
    cond = {"txt": jnp.ones((1, 8, cfg.text_dim), jnp.float32) * 0.01,
            "vec": jnp.ones((1, cfg.vec_dim), jnp.float32) * 0.01}
    return _dit_forward(core, params, x, cond)


def fwd_osp(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.open_sora_plan import make_osp_core
    core = make_osp_core(cfg, (2, 4, 4), 8)
    pt, ph, pw = cfg.patch
    x = jnp.ones((1, 2 * pt, 4 * ph, 4 * pw, cfg.in_channels),
                 jnp.float32) * 0.1
    cond = {"y": jnp.ones((1, 8, cfg.caption_dim), jnp.float32) * 0.01}
    return _dit_forward(core, params, x, cond)


def fwd_omnigen2(cfg, params):
    import jax.numpy as jnp
    from magcache_tpu.models.omnigen2 import make_omnigen2_core
    core = make_omnigen2_core(cfg, 8, (4, 4))
    x = jnp.ones((1, 4 * cfg.patch, 4 * cfg.patch, cfg.in_channels),
                 jnp.float32) * 0.1
    cond = {"txt": jnp.ones((1, 8, cfg.text_dim), jnp.float32) * 0.01,
            "txt_mask": jnp.ones((1, 8), jnp.float32)}
    return _dit_forward(core, params, x, cond)


# --------------------------------------------------------------------------
# family registry
# --------------------------------------------------------------------------

class Family:
    def __init__(self, name, detect, sniff, convert, init, forward=None):
        self.name, self.detect, self.sniff = name, detect, sniff
        self.convert, self.init, self.forward = convert, init, forward


def _registry():
    from magcache_tpu.models import convert as C
    from magcache_tpu.models.cogvideox import init_cogvideox_params
    from magcache_tpu.models.flux import init_flux_params
    from magcache_tpu.models.hunyuan import init_hunyuan_params
    from magcache_tpu.models.latte import init_latte_params
    from magcache_tpu.models.omnigen2 import init_omnigen2_params
    from magcache_tpu.models.open_sora_plan import init_osp_params
    from magcache_tpu.models.qwen_image import init_qwen_image_params
    from magcache_tpu.models.stdit3 import init_stdit3_params
    from magcache_tpu.models.vchitect import init_vchitect_params
    from magcache_tpu.models.wan import init_wan_params

    def has(*keys):
        return lambda ks: all(k in ks for k in keys)

    return [
        Family("wan-dit", has("patch_embedding.weight",
                              "blocks.0.self_attn.q.weight"),
               sniff_wan, C.convert_wan_state_dict, init_wan_params, fwd_wan),
        Family("hunyuan-dit",
               lambda ks: any(k.endswith("img_in.proj.weight") for k in ks)
               and any("individual_token_refiner" in k for k in ks),
               sniff_hunyuan, C.convert_hunyuan_state_dict,
               init_hunyuan_params, fwd_hunyuan),
        Family("flux-dit", has("img_in.weight",
                               "double_blocks.0.img_attn.qkv.weight"),
               sniff_flux, C.convert_flux_state_dict, init_flux_params,
               fwd_flux),
        Family("qwen-image-dit",
               has("img_in.weight", "txt_norm.weight",
                   "transformer_blocks.0.attn.to_q.weight"),
               sniff_qwen_image, C.convert_qwen_image_state_dict,
               init_qwen_image_params, fwd_qwen),
        Family("cogvideox-dit",
               has("patch_embed.proj.weight", "patch_embed.text_proj.weight"),
               sniff_cogvideox, C.convert_cogvideox_state_dict,
               init_cogvideox_params, fwd_cogvideox),
        Family("stdit3 (open-sora 1.2)",
               has("x_embedder.proj.weight", "y_embedder.y_embedding",
                   "spatial_blocks.0.attn.qkv.weight"),
               sniff_stdit3, C.convert_stdit3_state_dict, init_stdit3_params,
               fwd_stdit3),
        Family("latte",
               has("pos_embed.proj.weight",
                   "temporal_transformer_blocks.0.attn1.to_q.weight"),
               sniff_latte, C.convert_latte_state_dict, init_latte_params,
               fwd_latte),
        Family("vchitect-xl",
               has("pos_embed.proj.weight", "context_embedder.weight"),
               sniff_vchitect, C.convert_vchitect_state_dict,
               init_vchitect_params, fwd_vchitect),
        Family("open-sora-plan-t2v",
               has("pos_embed.proj.weight", "adaln_single.linear.weight",
                   "transformer_blocks.0.attn1.to_q.weight"),
               sniff_osp, C.convert_osp_state_dict, init_osp_params, fwd_osp),
        Family("omnigen2",
               has("x_embedder.weight", "layers.0.attn.to_q.weight"),
               C.sniff_omnigen2_config, C.convert_omnigen2_state_dict,
               init_omnigen2_params, fwd_omnigen2),
    ]


# --------------------------------------------------------------------------
# non-DiT components: existing self-sniffing loaders
# --------------------------------------------------------------------------

def _validate_special(path, keys, sd, forward):
    """Returns (name, info) or None. These components have loaders that sniff
    their own configs from the checkpoint."""
    import jax.numpy as jnp

    if "shared.weight" in keys or "encoder.block.0.layer.0.SelfAttention.q.weight" in keys \
            or any(k.startswith("blocks.0.attn.q.weight") for k in keys):
        from magcache_tpu.models.text import make_t5_encoder
        enc = make_t5_encoder(path, seq_len=16)
        if forward:
            emb = enc(["a cat"])
            return "t5/umt5 encoder", {"emb_shape": list(np.shape(emb))}
        return "t5/umt5 encoder", {}
    if any(k.startswith("text_model.") for k in keys):
        from magcache_tpu.models.text import ClipTextEncoder
        enc = ClipTextEncoder(path)
        if forward:
            pooled = enc(["a cat"])
            return "clip text encoder", {"pooled_shape": list(np.shape(pooled))}
        return "clip text encoder", {}
    if any(k.startswith("visual.") for k in keys):
        from magcache_tpu.models.clip import (CLIPVisionConfig,
                                              convert_clip_vision_state_dict)
        cfg = CLIPVisionConfig()
        convert_clip_vision_state_dict(sd, cfg)
        return "clip vision tower (wan i2v)", {}
    if any(k.startswith(("model.layers.", "layers.0.self_attn")) for k in keys) \
            and any("rotary" in k or "self_attn.q_proj" in k for k in keys):
        from magcache_tpu.models.text import LlamaTextEncoder
        enc = LlamaTextEncoder(path, out_len=8)
        if forward:
            emb, mask = enc(["a cat"])
            return "llama/qwen LM encoder", {"emb_shape": list(np.shape(emb))}
        return "llama/qwen LM encoder", {}
    if "encoder.conv1.weight" in keys:                      # Wan causal VAE
        from magcache_tpu.models.vae_wan import load_wan_vae_checkpoint
        vae, cfg = load_wan_vae_checkpoint(path)
        info = {"z_dim": cfg.z_dim}
        if forward:
            z = jnp.zeros((1, 1, 4, 4, cfg.z_dim))
            info["decode_shape"] = list(vae.decode(z).shape)
        return "wan causal VAE", info
    if "encoder.conv_in.conv.weight" in keys and \
            any("temporal" in k.lower() or "conv_time" in k for k in keys):
        from magcache_tpu.models.vae_osp import load_osp_vae_checkpoint
        load_osp_vae_checkpoint(path)
        return "open-sora-plan causal VAE", {}
    if "encoder.conv_in.weight" in keys and "quant_conv.weight" in keys:
        from magcache_tpu.models.vae_sd import load_sd_vae_checkpoint
        load_sd_vae_checkpoint(path)
        return "sd image VAE", {}
    if any(k.startswith("temporal_vae.") or "time_conv" in k for k in keys):
        from magcache_tpu.models.vae_temporal import load_vae_temporal_checkpoint
        load_vae_temporal_checkpoint(path)
        return "open-sora VAE_Temporal", {}
    if any(k.startswith("lin0.model.") or k.startswith("net.slice1")
           for k in keys) or ("lin0.model.1.weight" in keys):
        from magcache_tpu.eval.metrics import load_lpips_weights
        load_lpips_weights(path)
        return "lpips", {}
    return None


def validate_dir(path: str, forward: bool = False, dtype: str = "float32"):
    """Validate one weights directory/file. Returns a report record."""
    import jax
    from magcache_tpu.models.convert import load_safetensors_dir

    rec: Dict = {"path": path}
    try:
        sd = load_safetensors_dir(path)
    except Exception as e:
        rec.update(status="error", stage="load", error=f"{type(e).__name__}: {e}")
        return rec
    keys = set(sd)
    rec["tensors"] = len(sd)

    special = None
    try:
        special = _validate_special(path, keys, sd, forward)
    except Exception as e:
        rec.update(status="error", stage="special",
                   error=f"{type(e).__name__}: {e}",
                   trace=traceback.format_exc(limit=3))
        return rec
    if special is not None:
        name, info = special
        rec.update(status="ok", family=name, **info)
        return rec

    for fam in _registry():
        if not fam.detect(keys):
            continue
        rec["family"] = fam.name
        try:
            cfg = fam.sniff(sd)
            rec["config"] = {k: v for k, v in vars(cfg).items()
                             if isinstance(v, (int, float, str, bool))}
            if dtype != "float32":
                import dataclasses
                cfg = dataclasses.replace(cfg, dtype=dtype)
            params = fam.convert(sd, cfg)
            n_params = sum(int(np.prod(a.shape))
                           for a in jax.tree.leaves(params))
            rec["params_m"] = round(n_params / 1e6, 2)
            # structural comparison vs the init tree (shape-only, no memory)
            ref = jax.eval_shape(
                lambda key: fam.init(key, cfg),
                jax.ShapeDtypeStruct((2,), np.uint32))
            mism = []
            def cmp(pth, a, b):
                if tuple(a.shape) != tuple(b.shape):
                    mism.append(f"{jax.tree_util.keystr(pth)}: "
                                f"{tuple(a.shape)} vs {tuple(b.shape)}")
            jax.tree_util.tree_map_with_path(cmp, params, ref)
            rec["shape_match"] = not mism
            if mism:
                rec["mismatches"] = mism[:10]
            if forward and fam.forward is not None:
                rec["forward_out_shape"] = list(fam.forward(cfg, params))
                rec["forward"] = "ok"
            rec["status"] = "ok" if not mism else "shape-mismatch"
        except Exception as e:
            rec.update(status="error", stage="convert/forward",
                       error=f"{type(e).__name__}: {e}",
                       trace=traceback.format_exc(limit=3))
        return rec

    rec.update(status="unrecognized",
               sample_keys=sorted(keys)[:8])
    return rec


def find_weight_dirs(root: str):
    """Directories (or single weight files) that directly hold weights."""
    hits = []
    for dirpath, dirnames, filenames in os.walk(root):
        if any(f.endswith((".safetensors", ".pth", ".pt", ".bin"))
               for f in filenames):
            hits.append(dirpath)
            dirnames[:] = []     # don't descend into sharded subfolders
    if not hits and os.path.isfile(root):
        hits = [root]
    return sorted(hits)


def serve_smoke(dirs) -> Dict:
    """Weights-day serving smoke (--serve): find a Wan DiT among the
    validated dirs, build a WanPipeline on the CONVERTED weights (sniffed
    config, tiny 2-step euler geometry), stand up the HTTP endpoint, and run
    ONE /generate round-trip — the full user surface load -> serve -> 200.
    """
    import threading
    import urllib.request

    import jax.numpy as jnp  # noqa: F401  (backend must be up before server)

    from magcache_tpu.models.convert import load_safetensors_dir
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig
    from magcache_tpu.serve import PipelineServer, make_http_server

    for d in dirs:
        try:
            sd = load_safetensors_dir(d)
        except Exception:
            continue
        keys = set(sd)
        fam = next((f for f in _registry() if f.detect(keys)), None)
        if fam is None or not fam.name.startswith("wan"):
            continue
        cfg = fam.sniff(sd)
        if cfg.model_type != "t2v" or cfg.in_channels != 16:
            continue        # the smoke serves the plain t2v surface
        params = fam.convert(sd, cfg)
        pcfg = WanPipelineConfig(size=(64, 32), frame_num=5, sample_steps=2,
                                 sample_solver="euler", dtype=cfg.dtype,
                                 model_cfg_override=cfg)
        pipe = WanPipeline(pcfg, params=params)
        server = PipelineServer(pipe, steps=2)
        httpd = make_http_server(server, port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                "http://127.0.0.1:%d/generate" % httpd.server_address[1],
                json.dumps({"prompt": "weights-day smoke",
                            "seed": 0}).encode(),
                {"Content-Type": "application/json"})
            rec = json.load(urllib.request.urlopen(req, timeout=600))
            return {"path": d, "status": rec.get("status"),
                    "latents_shape": rec.get("result", {}).get(
                        "latents_shape")}
        finally:
            httpd.shutdown()
            server.shutdown()
    return {"status": "skipped",
            "note": "no t2v Wan DiT checkpoint found to serve"}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("root", help="checkpoint tree root (or one weights dir)")
    ap.add_argument("--forward", action="store_true",
                    help="run 2-step forward smokes on converted params")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--report", default=None, help="write JSON report here")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--serve", action="store_true",
                    help="after validation, serve a converted Wan DiT over "
                         "HTTP and run one /generate round-trip")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dirs = find_weight_dirs(args.root)
    if not dirs:
        print(f"no weight files found under {args.root}")
        return 1
    records = [validate_dir(d, forward=args.forward, dtype=args.dtype)
               for d in dirs]
    ok = sum(r["status"] == "ok" for r in records)
    for r in records:
        mark = {"ok": "PASS"}.get(r["status"], "FAIL")
        fam = r.get("family", r["status"])
        extra = (f" {r.get('params_m', '')}M" if "params_m" in r else "")
        err = f"  <- {r.get('error', '')}" if "error" in r else ""
        print(f"[{mark}] {r['path']}: {fam}{extra}{err}")
    print(f"\n{ok}/{len(records)} components validated")
    serve_rec = None
    if args.serve:
        serve_rec = serve_smoke(dirs)
        print(f"serve smoke: {serve_rec}")
    if args.report:
        payload = {"records": records, "ok": ok, "total": len(records)}
        if serve_rec is not None:
            payload["serve"] = serve_rec
        with open(args.report, "w") as f:
            json.dump(payload, f, indent=1, default=str)
        print(f"report -> {args.report}")
    bad_serve = args.serve and serve_rec.get("status") not in ("done",
                                                               "skipped")
    return 0 if ok == len(records) and not bad_serve else 1


if __name__ == "__main__":
    sys.exit(main())
