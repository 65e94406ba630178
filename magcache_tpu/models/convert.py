"""Checkpoint ingestion: reference torch/safetensors weights -> JAX pytrees.

The reference loads external checkpoints (wan `--ckpt_dir`, diffusers
`from_pretrained`). Here each converter maps the published state-dict naming
onto our stacked-block pytrees:

- torch ``nn.Linear.weight`` is [out, in] -> transposed to [in, out];
- per-block tensors are stacked along the leading depth axis (our blocks are
  `lax.scan`-ned over stacked params);
- fp32 islands (norm scales, modulation tables) stay f32; matmul weights cast
  to the model dtype.

Wan key layout (Wan2.1 DiT, e.g. ``blocks.{i}.self_attn.q.weight``):
  patch_embedding.{weight,bias}            conv3d k=(1,2,2) -> linear patchify
  text_embedding.{0,2}.{weight,bias}       two linears w/ GELU between
  time_embedding.{0,2}.{weight,bias}
  time_projection.1.{weight,bias}
  blocks.i.self_attn.{q,k,v,o}.{weight,bias}
  blocks.i.self_attn.norm_{q,k}.weight
  blocks.i.cross_attn.{q,k,v,o}.{weight,bias}  (+ k_img/v_img, norm_k_img for i2v)
  blocks.i.cross_attn.norm_{q,k}.weight
  blocks.i.norm3.{weight,bias}
  blocks.i.ffn.{0,2}.{weight,bias}
  blocks.i.modulation                      [1, 6, dim]
  head.head.{weight,bias}; head.modulation [1, 2, dim]
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "load_safetensors_dir", "save_params", "load_params",
    "convert_wan_state_dict", "load_wan_checkpoint",
    "convert_flux_state_dict", "load_flux_checkpoint",
    "convert_hunyuan_state_dict", "load_hunyuan_checkpoint",
    "convert_qwen_image_state_dict", "load_qwen_image_checkpoint",
    "convert_cogvideox_state_dict", "load_cogvideox_checkpoint",
    "convert_stdit3_state_dict", "load_stdit3_checkpoint",
    "convert_t5_encoder_state_dict", "load_t5_encoder_checkpoint",
    "convert_latte_state_dict", "load_latte_checkpoint",
    "convert_vchitect_state_dict", "load_vchitect_checkpoint",
    "convert_osp_state_dict", "load_osp_checkpoint",
    "convert_omnigen2_state_dict", "load_omnigen2_checkpoint",
]


def _torch_load_flat(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.pt/.bin file into a flat numpy dict, unwrapping the
    common {"state_dict": ...} / {"module": ...} containers (Wan2.1_VAE.pth,
    hyvideo's mp_rank_00_model_states.pt)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "module"):
        if isinstance(sd, dict) and wrapper in sd and isinstance(
                sd[wrapper], dict):
            sd = sd[wrapper]
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if not torch.is_tensor(v):
            continue
        v = v.detach()
        out[k] = (v.float().numpy() if v.dtype == torch.bfloat16
                  else v.numpy())
    return out


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load published weights under ``path`` into one flat numpy dict.

    Prefers *.safetensors (sharded HF dirs merge); falls back to torch
    .pth/.pt/.bin when the checkpoint ships that way (Wan2.1_VAE.pth, wan's
    umt5 .pth, hyvideo .pt) — safetensors-first so a mixed wan ckpt_dir
    (DiT safetensors next to VAE/T5 .pth) loads only the DiT."""
    from safetensors import safe_open

    sd: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files and os.path.isfile(path):
        files = [path]
    if not files:
        files = sorted(f for pat in ("*.pth", "*.pt", "*.bin")
                       for f in glob.glob(os.path.join(path, pat)))
        if len(files) > 1:
            # a wan-style ckpt_dir ships the text encoder / VAE / CLIP as
            # separately-named .pth next to the DiT; loading them all would
            # triple peak host RAM and silently mix models — keep only the
            # files that don't match the known auxiliary names
            aux = ("umt5", "_vae", "vae_", "clip", "tokenizer")
            main = [f for f in files
                    if not any(a in os.path.basename(f).lower() for a in aux)]
            files = main or files
    assert files, f"no safetensors or torch weights found under {path}"
    for f in files:
        if f.endswith(".safetensors"):
            with safe_open(f, framework="numpy") as fp:
                for k in fp.keys():
                    sd[k] = fp.get_tensor(k)
        else:
            flat = _torch_load_flat(f)
            dup = sd.keys() & flat.keys()
            if dup:
                raise ValueError(
                    f"duplicate keys across torch weight files under {path} "
                    f"(e.g. {sorted(dup)[:3]}): pass the intended file "
                    "directly instead of the directory")
            sd.update(flat)
    return sd


def _lin(sd, name, dtype):
    w = np.asarray(sd[f"{name}.weight"], np.float32).T  # [in, out]
    p = {"w": jnp.asarray(w, dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32), dtype)
    return p


def _stack(parts):
    out = {}
    for k in parts[0]:
        out[k] = jnp.stack([p[k] for p in parts])
    return out


def convert_wan_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map a Wan2.1/2.2 DiT state dict onto `init_wan_params`' tree."""
    dt = cfg.jdtype
    L = cfg.layers

    # conv3d patchify [out, in, kt, kh, kw] -> linear [in*kt*kh*kw, out]
    pw = np.asarray(sd["patch_embedding.weight"], np.float32)
    cout, cin, kt, kh, kw = pw.shape
    # our patchify orders features as [c, pt, ph, pw] flattened
    w = pw.transpose(1, 2, 3, 4, 0).reshape(cin * kt * kh * kw, cout)
    params = {
        "patch_embedding": {
            "w": jnp.asarray(w, dt),
            "b": jnp.asarray(np.asarray(sd["patch_embedding.bias"], np.float32), dt),
        },
        "text_embedding": {
            "in": _lin(sd, "text_embedding.0", jnp.float32),
            "out": _lin(sd, "text_embedding.2", jnp.float32),
        },
        "time_embedding": {
            "in": _lin(sd, "time_embedding.0", jnp.float32),
            "out": _lin(sd, "time_embedding.2", jnp.float32),
        },
        "time_projection": _lin(sd, "time_projection.1", jnp.float32),
        "head": {
            "modulation": jnp.asarray(
                np.asarray(sd["head.modulation"], np.float32).reshape(2, -1)),
            "out": _lin(sd, "head.head", dt),
        },
    }

    def blk(i, name):
        return f"blocks.{i}.{name}"

    blocks = {
        "modulation": jnp.asarray(np.stack([
            np.asarray(sd[blk(i, "modulation")], np.float32).reshape(6, -1)
            for i in range(L)])),
        "q": _stack([_lin(sd, blk(i, "self_attn.q"), dt) for i in range(L)]),
        "k": _stack([_lin(sd, blk(i, "self_attn.k"), dt) for i in range(L)]),
        "v": _stack([_lin(sd, blk(i, "self_attn.v"), dt) for i in range(L)]),
        "o": _stack([_lin(sd, blk(i, "self_attn.o"), dt) for i in range(L)]),
        "norm_q": jnp.stack([jnp.asarray(sd[blk(i, "self_attn.norm_q.weight")],
                                         jnp.float32) for i in range(L)]),
        "norm_k": jnp.stack([jnp.asarray(sd[blk(i, "self_attn.norm_k.weight")],
                                         jnp.float32) for i in range(L)]),
        "cross_q": _stack([_lin(sd, blk(i, "cross_attn.q"), dt) for i in range(L)]),
        "cross_k": _stack([_lin(sd, blk(i, "cross_attn.k"), dt) for i in range(L)]),
        "cross_v": _stack([_lin(sd, blk(i, "cross_attn.v"), dt) for i in range(L)]),
        "cross_o": _stack([_lin(sd, blk(i, "cross_attn.o"), dt) for i in range(L)]),
        "cross_norm_q": jnp.stack([jnp.asarray(sd[blk(i, "cross_attn.norm_q.weight")],
                                               jnp.float32) for i in range(L)]),
        "cross_norm_k": jnp.stack([jnp.asarray(sd[blk(i, "cross_attn.norm_k.weight")],
                                               jnp.float32) for i in range(L)]),
        "norm3_w": jnp.stack([jnp.asarray(sd[blk(i, "norm3.weight")], jnp.float32)
                              for i in range(L)]),
        "norm3_b": jnp.stack([jnp.asarray(sd[blk(i, "norm3.bias")], jnp.float32)
                              for i in range(L)]),
        "ffn1": _stack([_lin(sd, blk(i, "ffn.0"), dt) for i in range(L)]),
        "ffn2": _stack([_lin(sd, blk(i, "ffn.2"), dt) for i in range(L)]),
    }
    if cfg.has_clip:
        blocks["cross_k_img"] = _stack([_lin(sd, blk(i, "cross_attn.k_img"), dt)
                                        for i in range(L)])
        blocks["cross_v_img"] = _stack([_lin(sd, blk(i, "cross_attn.v_img"), dt)
                                        for i in range(L)])
        blocks["cross_norm_k_img"] = jnp.stack(
            [jnp.asarray(sd[blk(i, "cross_attn.norm_k_img.weight")], jnp.float32)
             for i in range(L)])
        params["img_emb"] = {
            "in": _lin(sd, "img_emb.proj.1", jnp.float32),
            "out": _lin(sd, "img_emb.proj.3", jnp.float32),
        }
    params["blocks"] = blocks
    return params


def load_wan_checkpoint(ckpt_dir: str, cfg):
    return convert_wan_state_dict(load_safetensors_dir(ckpt_dir), cfg)


def convert_flux_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map the black-forest-labs FLUX ("flux" repo naming) state dict.

    Key layout: img_in / txt_in / time_in.in_layer / vector_in.in_layer /
    guidance_in.in_layer / double_blocks.i.{img,txt}_{mod.lin,attn.qkv,
    attn.norm.{query,key}_norm.scale,attn.proj,mlp.{0,2}} /
    single_blocks.i.{modulation.lin,linear1,linear2,norm.{query,key}_norm.scale}
    / final_layer.{adaLN_modulation.1,linear}.
    """
    dt = cfg.jdtype
    L2, L1 = cfg.depth_double, cfg.depth_single

    def mlp(name):
        return {"in": _lin(sd, f"{name}.in_layer", jnp.float32),
                "out": _lin(sd, f"{name}.out_layer", jnp.float32)}

    params = {
        "img_in": _lin(sd, "img_in", dt),
        "txt_in": _lin(sd, "txt_in", dt),
        "time_in": mlp("time_in"),
        "vector_in": mlp("vector_in"),
        "final_mod": _lin(sd, "final_layer.adaLN_modulation.1", jnp.float32),
        "final_out": _lin(sd, "final_layer.linear", dt),
    }
    if cfg.guidance_embed and "guidance_in.in_layer.weight" in sd:
        params["guidance_in"] = mlp("guidance_in")

    def qk_scale(prefix, i):
        q = np.asarray(sd[f"{prefix}.norm.query_norm.scale"], np.float32)
        k = np.asarray(sd[f"{prefix}.norm.key_norm.scale"], np.float32)
        return np.stack([q, k])

    dbl = {
        "img_mod": _stack([_lin(sd, f"double_blocks.{i}.img_mod.lin", jnp.float32) for i in range(L2)]),
        "txt_mod": _stack([_lin(sd, f"double_blocks.{i}.txt_mod.lin", jnp.float32) for i in range(L2)]),
        "img_qkv": _stack([_lin(sd, f"double_blocks.{i}.img_attn.qkv", dt) for i in range(L2)]),
        "txt_qkv": _stack([_lin(sd, f"double_blocks.{i}.txt_attn.qkv", dt) for i in range(L2)]),
        "img_qk_scale": jnp.asarray(np.stack(
            [qk_scale(f"double_blocks.{i}.img_attn", i) for i in range(L2)])),
        "txt_qk_scale": jnp.asarray(np.stack(
            [qk_scale(f"double_blocks.{i}.txt_attn", i) for i in range(L2)])),
        "img_proj": _stack([_lin(sd, f"double_blocks.{i}.img_attn.proj", dt) for i in range(L2)]),
        "txt_proj": _stack([_lin(sd, f"double_blocks.{i}.txt_attn.proj", dt) for i in range(L2)]),
        "img_mlp1": _stack([_lin(sd, f"double_blocks.{i}.img_mlp.0", dt) for i in range(L2)]),
        "img_mlp2": _stack([_lin(sd, f"double_blocks.{i}.img_mlp.2", dt) for i in range(L2)]),
        "txt_mlp1": _stack([_lin(sd, f"double_blocks.{i}.txt_mlp.0", dt) for i in range(L2)]),
        "txt_mlp2": _stack([_lin(sd, f"double_blocks.{i}.txt_mlp.2", dt) for i in range(L2)]),
    }
    sgl = {
        "mod": _stack([_lin(sd, f"single_blocks.{i}.modulation.lin", jnp.float32) for i in range(L1)]),
        "lin1": _stack([_lin(sd, f"single_blocks.{i}.linear1", dt) for i in range(L1)]),
        "lin2": _stack([_lin(sd, f"single_blocks.{i}.linear2", dt) for i in range(L1)]),
        "qk_scale": jnp.asarray(np.stack(
            [qk_scale(f"single_blocks.{i}", i) for i in range(L1)])),
    }
    params["double"] = dbl
    params["single"] = sgl
    return params


def load_flux_checkpoint(ckpt_dir: str, cfg, lora_path: str = None,
                         lora_scale: float = 1.0):
    """``lora_path`` folds a PEFT/kohya LoRA adapter into the weights before
    conversion — the merge-once translation of the reference FLUX forward's
    runtime ``lora_scale`` PEFT re-scaling (``magcache_flux.py:62-75``)."""
    sd = load_safetensors_dir(ckpt_dir)
    if lora_path:
        from magcache_tpu.models.lora import load_lora_file, merge_lora_state_dict
        sd, n = merge_lora_state_dict(sd, load_lora_file(lora_path),
                                      scale=lora_scale)
        print(f"merged LoRA adapter {lora_path} into {n} layers")
    return convert_flux_state_dict(sd, cfg)


# --------------------------------------------------------------------------
# Native checkpoint save/load (orbax) — the framework's own persistence
# --------------------------------------------------------------------------

def save_params(params, path: str) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_params(path: str, like=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))


# --------------------------------------------------------------------------
# HunyuanVideo (official tencent `hyvideo` naming; the reference monkey-
# patches this model in MagCache4HunyuanVideo/magcache_sample_video.py)
# --------------------------------------------------------------------------

def convert_hunyuan_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map the official HunyuanVideo transformer state dict onto
    `init_hunyuan_params`' tree.

    Key layout (hyvideo/modules/models.py):
      img_in.proj (Conv3d k=(1,2,2)); txt_in.input_embedder;
      txt_in.t_embedder.mlp.{0,2}; txt_in.c_embedder.linear_{1,2};
      txt_in.individual_token_refiner.blocks.i.{norm1,self_attn_qkv,
        self_attn_proj,norm2,mlp.fc1,mlp.fc2,adaLN_modulation.1};
      time_in.mlp.{0,2}; vector_in.{in,out}_layer; guidance_in.mlp.{0,2};
      double_blocks.i.{img,txt}_{mod.linear,attn_qkv,attn_q_norm,attn_k_norm,
        attn_proj,mlp.fc1,mlp.fc2};
      single_blocks.i.{linear1,linear2,q_norm,k_norm,modulation.linear};
      final_layer.{adaLN_modulation.1,linear}.
    """
    dt = cfg.jdtype
    d = cfg.hidden
    L2, L1, LR = cfg.depth_double, cfg.depth_single, cfg.refiner_depth

    # strip an optional "model." / "module." prefix (pt checkpoint wrappers)
    for pre in ("model.", "module."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v for k, v in sd.items()}

    # conv3d patchify [d, C, kt, kh, kw] -> linear [(C*kt*kh*kw), d], feature
    # order (c, pt, ph, pw) = patchify_video's flattening
    pw_ = np.asarray(sd["img_in.proj.weight"], np.float32)
    cout, cin, kt, kh, kw = pw_.shape
    img_in_w = pw_.transpose(1, 2, 3, 4, 0).reshape(cin * kt * kh * kw, cout)

    def norm_pair(name, i, rms_only=True):
        w = np.asarray(sd[name], np.float32)
        return w

    def qk_scale(prefix):
        q = np.asarray(sd[f"{prefix}_q_norm.weight"], np.float32)
        k = np.asarray(sd[f"{prefix}_k_norm.weight"], np.float32)
        return np.stack([q, k])

    params = {
        "img_in": {"w": jnp.asarray(img_in_w, dt),
                   "b": jnp.asarray(np.asarray(sd["img_in.proj.bias"], np.float32), dt)},
        # hyvideo feeds the refiner output straight into the trunk; our flux
        # trunk view applies txt_in after the refiner -> identity
        "txt_in": {"w": jnp.eye(d, dtype=dt), "b": jnp.zeros((d,), dt)},
        "time_in": {"in": _lin(sd, "time_in.mlp.0", jnp.float32),
                    "out": _lin(sd, "time_in.mlp.2", jnp.float32)},
        "vector_in": {"in": _lin(sd, "vector_in.in_layer", jnp.float32),
                      "out": _lin(sd, "vector_in.out_layer", jnp.float32)},
        "final_mod": _lin(sd, "final_layer.adaLN_modulation.1", jnp.float32),
        "final_out": _lin(sd, "final_layer.linear", dt),
        "refiner": {
            "in": _lin(sd, "txt_in.input_embedder", jnp.float32),
            "t_embed": {"in": _lin(sd, "txt_in.t_embedder.mlp.0", jnp.float32),
                        "out": _lin(sd, "txt_in.t_embedder.mlp.2", jnp.float32)},
            "c_embed": {"in": _lin(sd, "txt_in.c_embedder.linear_1", jnp.float32),
                        "out": _lin(sd, "txt_in.c_embedder.linear_2", jnp.float32)},
            "blocks": {
                "qkv": _stack([_lin(sd, f"txt_in.individual_token_refiner.blocks.{i}.self_attn_qkv", dt) for i in range(LR)]),
                "proj": _stack([_lin(sd, f"txt_in.individual_token_refiner.blocks.{i}.self_attn_proj", dt) for i in range(LR)]),
                "mlp1": _stack([_lin(sd, f"txt_in.individual_token_refiner.blocks.{i}.mlp.fc1", dt) for i in range(LR)]),
                "mlp2": _stack([_lin(sd, f"txt_in.individual_token_refiner.blocks.{i}.mlp.fc2", dt) for i in range(LR)]),
                "mod": _stack([_lin(sd, f"txt_in.individual_token_refiner.blocks.{i}.adaLN_modulation.1", jnp.float32) for i in range(LR)]),
                "norm1_w": jnp.stack([jnp.asarray(sd[f"txt_in.individual_token_refiner.blocks.{i}.norm1.weight"], jnp.float32) for i in range(LR)]),
                "norm1_b": jnp.stack([jnp.asarray(sd[f"txt_in.individual_token_refiner.blocks.{i}.norm1.bias"], jnp.float32) for i in range(LR)]),
                "norm2_w": jnp.stack([jnp.asarray(sd[f"txt_in.individual_token_refiner.blocks.{i}.norm2.weight"], jnp.float32) for i in range(LR)]),
                "norm2_b": jnp.stack([jnp.asarray(sd[f"txt_in.individual_token_refiner.blocks.{i}.norm2.bias"], jnp.float32) for i in range(LR)]),
            },
        },
        "double": {
            "img_mod": _stack([_lin(sd, f"double_blocks.{i}.img_mod.linear", jnp.float32) for i in range(L2)]),
            "txt_mod": _stack([_lin(sd, f"double_blocks.{i}.txt_mod.linear", jnp.float32) for i in range(L2)]),
            "img_qkv": _stack([_lin(sd, f"double_blocks.{i}.img_attn_qkv", dt) for i in range(L2)]),
            "txt_qkv": _stack([_lin(sd, f"double_blocks.{i}.txt_attn_qkv", dt) for i in range(L2)]),
            "img_qk_scale": jnp.asarray(np.stack([qk_scale(f"double_blocks.{i}.img_attn") for i in range(L2)])),
            "txt_qk_scale": jnp.asarray(np.stack([qk_scale(f"double_blocks.{i}.txt_attn") for i in range(L2)])),
            "img_proj": _stack([_lin(sd, f"double_blocks.{i}.img_attn_proj", dt) for i in range(L2)]),
            "txt_proj": _stack([_lin(sd, f"double_blocks.{i}.txt_attn_proj", dt) for i in range(L2)]),
            "img_mlp1": _stack([_lin(sd, f"double_blocks.{i}.img_mlp.fc1", dt) for i in range(L2)]),
            "img_mlp2": _stack([_lin(sd, f"double_blocks.{i}.img_mlp.fc2", dt) for i in range(L2)]),
            "txt_mlp1": _stack([_lin(sd, f"double_blocks.{i}.txt_mlp.fc1", dt) for i in range(L2)]),
            "txt_mlp2": _stack([_lin(sd, f"double_blocks.{i}.txt_mlp.fc2", dt) for i in range(L2)]),
        },
        "single": {
            "mod": _stack([_lin(sd, f"single_blocks.{i}.modulation.linear", jnp.float32) for i in range(L1)]),
            "lin1": _stack([_lin(sd, f"single_blocks.{i}.linear1", dt) for i in range(L1)]),
            "lin2": _stack([_lin(sd, f"single_blocks.{i}.linear2", dt) for i in range(L1)]),
            "qk_scale": jnp.asarray(np.stack([
                np.stack([np.asarray(sd[f"single_blocks.{i}.q_norm.weight"], np.float32),
                          np.asarray(sd[f"single_blocks.{i}.k_norm.weight"], np.float32)])
                for i in range(L1)])),
        },
    }
    if cfg.guidance_embed and "guidance_in.mlp.0.weight" in sd:
        params["guidance_in"] = {"in": _lin(sd, "guidance_in.mlp.0", jnp.float32),
                                 "out": _lin(sd, "guidance_in.mlp.2", jnp.float32)}
    return params


def load_hunyuan_checkpoint(ckpt_dir: str, cfg):
    return convert_hunyuan_state_dict(load_safetensors_dir(ckpt_dir), cfg)


# --------------------------------------------------------------------------
# Qwen-Image / Qwen-Image-Edit (diffusers QwenImageTransformer2DModel naming;
# reference adapter: MagCache4QwenImage/magcache_generate.py)
# --------------------------------------------------------------------------

def convert_qwen_image_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map the diffusers Qwen-Image transformer state dict onto
    `init_qwen_image_params`' tree (flux layout + txt_norm, depth_single=0).

    Key layout: img_in, txt_norm, txt_in,
      time_text_embed.timestep_embedder.linear_{1,2},
      transformer_blocks.i.{img_mod.1, txt_mod.1,
        attn.{to_q,to_k,to_v,norm_q,norm_k,to_out.0},
        attn.{add_q_proj,add_k_proj,add_v_proj,norm_added_q,norm_added_k,
              to_add_out},
        img_mlp.net.0.proj, img_mlp.net.2, txt_mlp.net.0.proj, txt_mlp.net.2},
      norm_out.linear, proj_out.
    """
    dt = cfg.jdtype if hasattr(cfg, "jdtype") else jnp.float32
    fcfg = cfg.to_flux()
    dt = fcfg.jdtype
    d = fcfg.hidden
    L = fcfg.depth_double

    def cat_qkv(i, names):
        ws = [np.asarray(sd[f"transformer_blocks.{i}.attn.{n}.weight"], np.float32).T
              for n in names]
        bs = [np.asarray(sd[f"transformer_blocks.{i}.attn.{n}.bias"], np.float32)
              for n in names]
        return {"w": jnp.asarray(np.concatenate(ws, axis=1), dt),
                "b": jnp.asarray(np.concatenate(bs, axis=0), dt)}

    def qk_scale(i, qn, kn):
        q = np.asarray(sd[f"transformer_blocks.{i}.attn.{qn}.weight"], np.float32)
        k = np.asarray(sd[f"transformer_blocks.{i}.attn.{kn}.weight"], np.float32)
        return np.stack([q, k])

    # depth_single == 0: zero-length stacks matching init_flux_params' shapes
    mlp_d = fcfg.mlp_ratio * d
    zero_single = {
        "mod": {"w": jnp.zeros((0, d, 3 * d), dt), "b": jnp.zeros((0, 3 * d), dt)},
        "lin1": {"w": jnp.zeros((0, d, 3 * d + mlp_d), dt),
                 "b": jnp.zeros((0, 3 * d + mlp_d), dt)},
        "lin2": {"w": jnp.zeros((0, d + mlp_d, d), dt), "b": jnp.zeros((0, d), dt)},
        "qk_scale": jnp.ones((0, 2, fcfg.head_dim), jnp.float32),
    }

    params = {
        "txt_norm": jnp.asarray(sd["txt_norm.weight"], jnp.float32),
        "img_in": _lin(sd, "img_in", dt),
        "txt_in": _lin(sd, "txt_in", dt),
        "time_in": {"in": _lin(sd, "time_text_embed.timestep_embedder.linear_1", jnp.float32),
                    "out": _lin(sd, "time_text_embed.timestep_embedder.linear_2", jnp.float32)},
        # Qwen-Image has no pooled-text vector; the flux tree slot is unused
        "vector_in": {"in": {"w": jnp.zeros((fcfg.vec_dim, d), jnp.float32),
                             "b": jnp.zeros((d,), jnp.float32)},
                      "out": {"w": jnp.zeros((d, d), jnp.float32),
                              "b": jnp.zeros((d,), jnp.float32)}},
        "final_mod": _lin(sd, "norm_out.linear", jnp.float32),
        "final_out": _lin(sd, "proj_out", dt),
        "double": {
            "img_mod": _stack([_lin(sd, f"transformer_blocks.{i}.img_mod.1", jnp.float32) for i in range(L)]),
            "txt_mod": _stack([_lin(sd, f"transformer_blocks.{i}.txt_mod.1", jnp.float32) for i in range(L)]),
            "img_qkv": _stack([cat_qkv(i, ["to_q", "to_k", "to_v"]) for i in range(L)]),
            "txt_qkv": _stack([cat_qkv(i, ["add_q_proj", "add_k_proj", "add_v_proj"]) for i in range(L)]),
            "img_qk_scale": jnp.asarray(np.stack([qk_scale(i, "norm_q", "norm_k") for i in range(L)])),
            "txt_qk_scale": jnp.asarray(np.stack([qk_scale(i, "norm_added_q", "norm_added_k") for i in range(L)])),
            "img_proj": _stack([_lin(sd, f"transformer_blocks.{i}.attn.to_out.0", dt) for i in range(L)]),
            "txt_proj": _stack([_lin(sd, f"transformer_blocks.{i}.attn.to_add_out", dt) for i in range(L)]),
            "img_mlp1": _stack([_lin(sd, f"transformer_blocks.{i}.img_mlp.net.0.proj", dt) for i in range(L)]),
            "img_mlp2": _stack([_lin(sd, f"transformer_blocks.{i}.img_mlp.net.2", dt) for i in range(L)]),
            "txt_mlp1": _stack([_lin(sd, f"transformer_blocks.{i}.txt_mlp.net.0.proj", dt) for i in range(L)]),
            "txt_mlp2": _stack([_lin(sd, f"transformer_blocks.{i}.txt_mlp.net.2", dt) for i in range(L)]),
        },
        "single": zero_single,
    }
    return params


def load_qwen_image_checkpoint(ckpt_dir: str, cfg):
    return convert_qwen_image_state_dict(load_safetensors_dir(ckpt_dir), cfg)


# --------------------------------------------------------------------------
# CogVideoX (diffusers CogVideoXTransformer3DModel naming; reference:
# videosys/models/transformers/cogvideox_transformer_3d.py)
# --------------------------------------------------------------------------

def convert_cogvideox_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map a CogVideoX transformer state dict onto `init_cogvideox_params`.

    Key layout (cogvideox_transformer_3d.py:405-455 + modules):
      patch_embed.{proj (Conv2d), text_proj}; time_embedding.linear_{1,2};
      transformer_blocks.i.{norm1.{linear,norm}, attn1.{to_q,to_k,to_v,
        norm_q,norm_k,to_out.0}, norm2.{linear,norm}, ff.net.0.proj,
        ff.net.2}; norm_final; norm_out.{linear,norm}; proj_out.
    """
    dt = cfg.jdtype
    L = cfg.layers

    # conv2d per-frame patchify [d, C, p, p] -> linear [(C*p*p), d], feature
    # order (c, ph, pw) = make_cogvideox_core._patchify's flattening
    pw_ = np.asarray(sd["patch_embed.proj.weight"], np.float32)
    cout, cin, ph, pw = pw_.shape
    pe_w = pw_.transpose(1, 2, 3, 0).reshape(cin * ph * pw, cout)

    def cat_qkv(i):
        ws = [np.asarray(sd[f"transformer_blocks.{i}.attn1.{n}.weight"], np.float32).T
              for n in ("to_q", "to_k", "to_v")]
        bs = [np.asarray(sd[f"transformer_blocks.{i}.attn1.{n}.bias"], np.float32)
              for n in ("to_q", "to_k", "to_v")]
        return {"w": jnp.asarray(np.concatenate(ws, axis=1), dt),
                "b": jnp.asarray(np.concatenate(bs, axis=0), dt)}

    def ln_stack(fmt, part):
        return jnp.stack([jnp.asarray(sd[fmt.format(i=i) + f".{part}"], jnp.float32)
                          for i in range(L)])

    params = {
        "patch_embed": {"w": jnp.asarray(pe_w, dt),
                        "b": jnp.asarray(np.asarray(sd["patch_embed.proj.bias"], np.float32), dt)},
        "text_proj": _lin(sd, "patch_embed.text_proj", dt),
        "time": {"in": _lin(sd, "time_embedding.linear_1", jnp.float32),
                 "out": _lin(sd, "time_embedding.linear_2", jnp.float32)},
        "blocks": {
            "mod1": _stack([_lin(sd, f"transformer_blocks.{i}.norm1.linear", dt) for i in range(L)]),
            "mod2": _stack([_lin(sd, f"transformer_blocks.{i}.norm2.linear", dt) for i in range(L)]),
            "ln1_w": ln_stack("transformer_blocks.{i}.norm1.norm", "weight"),
            "ln1_b": ln_stack("transformer_blocks.{i}.norm1.norm", "bias"),
            "ln2_w": ln_stack("transformer_blocks.{i}.norm2.norm", "weight"),
            "ln2_b": ln_stack("transformer_blocks.{i}.norm2.norm", "bias"),
            "qkv": _stack([cat_qkv(i) for i in range(L)]),
            "q_norm_w": ln_stack("transformer_blocks.{i}.attn1.norm_q", "weight"),
            "q_norm_b": ln_stack("transformer_blocks.{i}.attn1.norm_q", "bias"),
            "k_norm_w": ln_stack("transformer_blocks.{i}.attn1.norm_k", "weight"),
            "k_norm_b": ln_stack("transformer_blocks.{i}.attn1.norm_k", "bias"),
            "proj": _stack([_lin(sd, f"transformer_blocks.{i}.attn1.to_out.0", dt) for i in range(L)]),
            "ff1": _stack([_lin(sd, f"transformer_blocks.{i}.ff.net.0.proj", dt) for i in range(L)]),
            "ff2": _stack([_lin(sd, f"transformer_blocks.{i}.ff.net.2", dt) for i in range(L)]),
        },
        "norm_final_w": jnp.asarray(sd["norm_final.weight"], jnp.float32),
        "norm_final_b": jnp.asarray(sd["norm_final.bias"], jnp.float32),
        "norm_out_w": jnp.asarray(sd["norm_out.norm.weight"], jnp.float32),
        "norm_out_b": jnp.asarray(sd["norm_out.norm.bias"], jnp.float32),
        "final_mod": _lin(sd, "norm_out.linear", jnp.float32),
        "final_out": _lin(sd, "proj_out", dt),
    }
    return params


def load_cogvideox_checkpoint(ckpt_dir: str, cfg):
    return convert_cogvideox_state_dict(load_safetensors_dir(ckpt_dir), cfg)


# --------------------------------------------------------------------------
# STDiT3 / Open-Sora 1.2 (videosys open_sora_transformer_3d.py naming)
# --------------------------------------------------------------------------

def convert_stdit3_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map an Open-Sora 1.2 STDiT3 state dict onto `init_stdit3_params`.

    Key layout (open_sora_transformer_3d.py:345-426 + modules):
      x_embedder.proj (Conv3d); t_embedder.mlp.{0,2}; fps_embedder.mlp.{0,2};
      t_block.1; y_embedder.{y_embedding, y_proj.fc1, y_proj.fc2};
      {spatial,temporal}_blocks.i.{scale_shift_table, attn.{qkv,q_norm,k_norm,
        proj}, cross_attn.{q_linear,kv_linear,proj}, mlp.{fc1,fc2}};
      final_layer.{linear, scale_shift_table}.
    """
    L = cfg.depth

    pw_ = np.asarray(sd["x_embedder.proj.weight"], np.float32)
    cout, cin, kt, kh, kw = pw_.shape
    pe_w = pw_.transpose(1, 2, 3, 4, 0).reshape(cin * kt * kh * kw, cout)

    def group(prefix):
        g = {
            "scale_shift": jnp.stack([
                jnp.asarray(sd[f"{prefix}.{i}.scale_shift_table"], jnp.float32)
                for i in range(L)]),
            "qkv": _stack([_lin(sd, f"{prefix}.{i}.attn.qkv", cfg.jdtype) for i in range(L)]),
            "proj": _stack([_lin(sd, f"{prefix}.{i}.attn.proj", cfg.jdtype) for i in range(L)]),
            "cross_q": _stack([_lin(sd, f"{prefix}.{i}.cross_attn.q_linear", cfg.jdtype) for i in range(L)]),
            "cross_kv": _stack([_lin(sd, f"{prefix}.{i}.cross_attn.kv_linear", cfg.jdtype) for i in range(L)]),
            "cross_o": _stack([_lin(sd, f"{prefix}.{i}.cross_attn.proj", cfg.jdtype) for i in range(L)]),
            "mlp1": _stack([_lin(sd, f"{prefix}.{i}.mlp.fc1", cfg.jdtype) for i in range(L)]),
            "mlp2": _stack([_lin(sd, f"{prefix}.{i}.mlp.fc2", cfg.jdtype) for i in range(L)]),
        }
        if cfg.qk_norm:
            g["q_norm"] = jnp.stack([jnp.asarray(sd[f"{prefix}.{i}.attn.q_norm.weight"], jnp.float32) for i in range(L)])
            g["k_norm"] = jnp.stack([jnp.asarray(sd[f"{prefix}.{i}.attn.k_norm.weight"], jnp.float32) for i in range(L)])
        return g

    return {
        "y_null": jnp.asarray(sd["y_embedder.y_embedding"], jnp.float32),
        "patch_embed": {"w": jnp.asarray(pe_w, jnp.float32),
                        "b": jnp.asarray(np.asarray(sd["x_embedder.proj.bias"], np.float32), jnp.float32)},
        "t_embed": {"in": _lin(sd, "t_embedder.mlp.0", jnp.float32),
                    "out": _lin(sd, "t_embedder.mlp.2", jnp.float32)},
        "fps_embed": {"in": _lin(sd, "fps_embedder.mlp.0", jnp.float32),
                      "out": _lin(sd, "fps_embedder.mlp.2", jnp.float32)},
        "t_block": _lin(sd, "t_block.1", jnp.float32),
        "y_embed": {"in": _lin(sd, "y_embedder.y_proj.fc1", jnp.float32),
                    "out": _lin(sd, "y_embedder.y_proj.fc2", jnp.float32)},
        "spatial": group("spatial_blocks"),
        "temporal": group("temporal_blocks"),
        "final": {
            "scale_shift": jnp.asarray(sd["final_layer.scale_shift_table"], jnp.float32),
            "out": _lin(sd, "final_layer.linear", jnp.float32),
        },
    }


def load_stdit3_checkpoint(ckpt_dir: str, cfg):
    return convert_stdit3_state_dict(load_safetensors_dir(ckpt_dir), cfg)


# --------------------------------------------------------------------------
# T5 encoder (torch HF naming -> FlaxT5EncoderModel params)
# --------------------------------------------------------------------------

def convert_t5_encoder_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Map a torch T5/umt5 encoder state dict onto FlaxT5EncoderModel.params.

    The reference loads the torch T5 through ColossalAI's shardformer
    (``videosys/core/shardformer/t5/policy.py``); here the torch weights map
    onto the HF Flax tree that `JaxT5Encoder` jits: Linear weights transpose
    to ``kernel`` [in, out]; embeddings/norm scales pass through.
    """
    params: dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, v in sd.items():
        if key.startswith(("decoder.", "lm_head")):
            continue
        v = np.asarray(v, np.float32)
        if key == "shared.weight":
            put(("shared", "embedding"), v)
            continue
        if key == "encoder.embed_tokens.weight":
            continue  # tied to shared
        if key == "encoder.final_layer_norm.weight":
            put(("encoder", "final_layer_norm", "weight"), v)
            continue
        parts = key.split(".")
        if parts[0] != "encoder" or parts[1] != "block":
            continue
        i, j = parts[2], parts[4]  # block idx, layer idx
        rest = parts[5:]
        base = ("encoder", "block", i, "layer", j)
        if rest[0] == "layer_norm":
            put(base + ("layer_norm", "weight"), v)
        elif rest[0] == "SelfAttention":
            name = rest[1]
            if name == "relative_attention_bias":
                put(base + ("SelfAttention", "relative_attention_bias",
                            "embedding"), v)
            else:  # q/k/v/o Linear (no bias in T5)
                put(base + ("SelfAttention", name, "kernel"), v.T)
        elif rest[0] == "DenseReluDense":
            put(base + ("DenseReluDense", rest[1], "kernel"), v.T)
    return params


def load_t5_encoder_checkpoint(path: str):
    return convert_t5_encoder_state_dict(load_safetensors_dir(path))

# --------------------------------------------------------------------------
# Latte T2V (published maxin-cn/Latte-1 `transformer/` naming — PixArt-style
# ada_norm_single blocks; ref videosys/models/transformers/latte_transformer_3d.py:895)
# --------------------------------------------------------------------------

def convert_latte_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map a Latte-1 transformer state dict onto `init_latte_params`' tree.

    Key layout (diffusers PixArt lineage):
      pos_embed.proj.{weight,bias}                 conv2d patchify [d, c, p, p]
      caption_projection.linear_{1,2}.{weight,bias}
      adaln_single.emb.timestep_embedder.linear_{1,2}.{weight,bias}
      adaln_single.linear.{weight,bias}            -> 6-way global modulation
      transformer_blocks.{i}.scale_shift_table     [6, d]
      transformer_blocks.{i}.attn1.to_{q,k,v}/to_out.0
      transformer_blocks.{i}.attn2.to_{q,k,v}/to_out.0   (cross; spatial only)
      transformer_blocks.{i}.ff.net.0.proj / ff.net.2    (gelu-approximate)
      temporal_transformer_blocks.{i}.*            (same minus attn2)
      scale_shift_table                            [2, d] (final head)
      proj_out.{weight,bias}
    `temp_pos_embed` is a non-persistent buffer (rebuilt, not loaded).
    """
    dt = cfg.jdtype
    L = cfg.depth

    pw = np.asarray(sd["pos_embed.proj.weight"], np.float32)  # [d, c, p, p]
    d_, c, p, _ = pw.shape
    patch_w = pw.transpose(1, 2, 3, 0).reshape(c * p * p, d_)

    def qkv(base):
        w = np.concatenate([np.asarray(sd[f"{base}.to_{n}.weight"], np.float32).T
                            for n in "qkv"], axis=1)
        out = {"w": jnp.asarray(w, dt)}
        if f"{base}.to_q.bias" in sd:
            out["b"] = jnp.asarray(np.concatenate(
                [np.asarray(sd[f"{base}.to_{n}.bias"], np.float32)
                 for n in "qkv"]), dt)
        return out

    def kv(base):
        w = np.concatenate([np.asarray(sd[f"{base}.to_{n}.weight"], np.float32).T
                            for n in "kv"], axis=1)
        out = {"w": jnp.asarray(w, dt)}
        if f"{base}.to_k.bias" in sd:
            out["b"] = jnp.asarray(np.concatenate(
                [np.asarray(sd[f"{base}.to_{n}.bias"], np.float32)
                 for n in "kv"]), dt)
        return out

    def group(prefix, cross):
        g = {
            "scale_shift": jnp.asarray(np.stack(
                [np.asarray(sd[f"{prefix}.{i}.scale_shift_table"], np.float32)
                 for i in range(L)])),
            "qkv": _stack([qkv(f"{prefix}.{i}.attn1") for i in range(L)]),
            "proj": _stack([_lin(sd, f"{prefix}.{i}.attn1.to_out.0", dt)
                            for i in range(L)]),
            "ff1": _stack([_lin(sd, f"{prefix}.{i}.ff.net.0.proj", dt)
                           for i in range(L)]),
            "ff2": _stack([_lin(sd, f"{prefix}.{i}.ff.net.2", dt)
                           for i in range(L)]),
        }
        if cross:
            g["cross_q"] = _stack([_lin(sd, f"{prefix}.{i}.attn2.to_q", dt)
                                   for i in range(L)])
            g["cross_kv"] = _stack([kv(f"{prefix}.{i}.attn2") for i in range(L)])
            g["cross_o"] = _stack([_lin(sd, f"{prefix}.{i}.attn2.to_out.0", dt)
                                   for i in range(L)])
        return g

    return {
        "patch_embed": {
            "w": jnp.asarray(patch_w, dt),
            "b": jnp.asarray(np.asarray(sd["pos_embed.proj.bias"], np.float32), dt),
        },
        "caption": {"in": _lin(sd, "caption_projection.linear_1", jnp.float32),
                    "out": _lin(sd, "caption_projection.linear_2", jnp.float32)},
        "time": {"in": _lin(sd, "adaln_single.emb.timestep_embedder.linear_1",
                            jnp.float32),
                 "out": _lin(sd, "adaln_single.emb.timestep_embedder.linear_2",
                             jnp.float32)},
        "adaln_single": _lin(sd, "adaln_single.linear", jnp.float32),
        "temp_pos": None,
        "spatial": group("transformer_blocks", cross=True),
        "temporal": group("temporal_transformer_blocks", cross=False),
        "final_mod": jnp.asarray(np.asarray(sd["scale_shift_table"], np.float32)),
        "final_out": _lin(sd, "proj_out", jnp.float32),
    }


def load_latte_checkpoint(ckpt_dir: str, cfg):
    return convert_latte_state_dict(load_safetensors_dir(ckpt_dir), cfg)

# --------------------------------------------------------------------------
# Vchitect-XL (published Vchitect-XL-2B `diffusion_pytorch_model.safetensors`
# naming; ref videosys/models/transformers/vchitect_transformer_3d.py:260 and
# attentions.py:373-416 for the attention projection set)
# --------------------------------------------------------------------------

def convert_vchitect_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map a VchitectXLTransformerModel state dict onto
    `init_vchitect_params`' tree.

    Blocks 0..L-2 stack for `lax.scan`; the final block is `context_pre_only`
    (AdaLN-Continuous context norm, no context output) and converts separately.
    ``pos_embed.pos_embed`` (deterministic sincos buffer) and the last block's
    ``to_add_out_temporal`` (computed-but-discarded in the reference) are
    intentionally not loaded.
    """
    dt = cfg.jdtype
    L = cfg.depth

    pw = np.asarray(sd["pos_embed.proj.weight"], np.float32)  # [d, c, p, p]
    d_, c, p, _ = pw.shape
    patch_w = pw.transpose(1, 2, 3, 0).reshape(c * p * p, d_)

    ATTN = {"q": "to_q", "k": "to_k", "v": "to_v", "o": "to_out.0",
            "qt": "to_q_temp", "kt": "to_k_temp", "vt": "to_v_temp",
            "ot": "to_out_temporal", "qc": "to_q_cross", "oc": "to_out_context",
            "add_q": "add_q_proj", "add_k": "add_k_proj", "add_v": "add_v_proj"}

    def block(i, pre_only):
        b = f"transformer_blocks.{i}"
        out = {"mod_x": _lin(sd, f"{b}.norm1.linear", dt)}
        for ours, theirs in ATTN.items():
            out[ours] = _lin(sd, f"{b}.attn.{theirs}", dt)
        out["ff1"] = _lin(sd, f"{b}.ff.net.0.proj", dt)
        out["ff2"] = _lin(sd, f"{b}.ff.net.2", dt)
        if pre_only:
            out["mod_c2"] = _lin(sd, f"{b}.norm1_context.linear", dt)
        else:
            out["mod_c"] = _lin(sd, f"{b}.norm1_context.linear", dt)
            out["add_out"] = _lin(sd, f"{b}.attn.to_add_out", dt)
            out["add_out_t"] = _lin(sd, f"{b}.attn.to_add_out_temporal", dt)
            out["ffc1"] = _lin(sd, f"{b}.ff_context.net.0.proj", dt)
            out["ffc2"] = _lin(sd, f"{b}.ff_context.net.2", dt)
        return out

    return {
        "patch_embed": {
            "w": jnp.asarray(patch_w, dt),
            "b": jnp.asarray(np.asarray(sd["pos_embed.proj.bias"], np.float32), dt),
        },
        "context_in": _lin(sd, "context_embedder", dt),
        "time_in": {
            "in": _lin(sd, "time_text_embed.timestep_embedder.linear_1",
                       jnp.float32),
            "out": _lin(sd, "time_text_embed.timestep_embedder.linear_2",
                        jnp.float32),
        },
        "pooled_in": {
            "in": _lin(sd, "time_text_embed.text_embedder.linear_1",
                       jnp.float32),
            "out": _lin(sd, "time_text_embed.text_embedder.linear_2",
                        jnp.float32),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[block(i, False) for i in range(L - 1)]),
        "last": block(L - 1, True),
        "norm_out_mod": _lin(sd, "norm_out.linear", jnp.float32),
        "proj_out": _lin(sd, "proj_out", jnp.float32),
    }


def load_vchitect_checkpoint(ckpt_dir: str, cfg):
    return convert_vchitect_state_dict(load_safetensors_dir(ckpt_dir), cfg)

# --------------------------------------------------------------------------
# Open-Sora-Plan v1.2 (published LanguageBind/Open-Sora-Plan-v1.2.0
# `93x720p/` naming; ref open_sora_plan_v120_transformer_3d.py:1505)
# --------------------------------------------------------------------------

def convert_osp_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map an OpenSoraT2V (v1.2) state dict onto `init_osp_params`' tree.

    PixArt-lineage naming: pos_embed.proj (conv2d patchify), adaln_single,
    caption_projection, per-block scale_shift_table + attn1/attn2 + ff, final
    scale_shift_table [2, d] + proj_out. RoPE has no parameters.
    """
    dt = cfg.jdtype
    L = cfg.depth

    pw = np.asarray(sd["pos_embed.proj.weight"], np.float32)
    if pw.ndim == 5:                     # conv3d variant (patch_size_t > 1)
        d_, c, kt, kh, kw = pw.shape
        patch_w = pw.transpose(1, 2, 3, 4, 0).reshape(c * kt * kh * kw, d_)
    else:                                # conv2d (patch_size_t == 1)
        d_, c, kh, kw = pw.shape
        patch_w = pw.transpose(1, 2, 3, 0).reshape(c * kh * kw, d_)

    def cat_lin(names, dtype):
        w = np.concatenate([np.asarray(sd[f"{n}.weight"], np.float32).T
                            for n in names], axis=1)
        out = {"w": jnp.asarray(w, dtype)}
        if f"{names[0]}.bias" in sd:
            out["b"] = jnp.asarray(np.concatenate(
                [np.asarray(sd[f"{n}.bias"], np.float32) for n in names]), dtype)
        return out

    def blk(i):
        b = f"transformer_blocks.{i}"
        return {
            "scale_shift": jnp.asarray(
                np.asarray(sd[f"{b}.scale_shift_table"], np.float32)),
            "qkv": cat_lin([f"{b}.attn1.to_{n}" for n in "qkv"], dt),
            "proj": _lin(sd, f"{b}.attn1.to_out.0", dt),
            "cross_q": _lin(sd, f"{b}.attn2.to_q", dt),
            "cross_kv": cat_lin([f"{b}.attn2.to_{n}" for n in "kv"], dt),
            "cross_o": _lin(sd, f"{b}.attn2.to_out.0", dt),
            "ff1": _lin(sd, f"{b}.ff.net.0.proj", dt),
            "ff2": _lin(sd, f"{b}.ff.net.2", dt),
        }

    return {
        "patch_embed": {
            "w": jnp.asarray(patch_w, dt),
            "b": jnp.asarray(np.asarray(sd["pos_embed.proj.bias"], np.float32), dt),
        },
        "caption": {"in": _lin(sd, "caption_projection.linear_1", jnp.float32),
                    "out": _lin(sd, "caption_projection.linear_2", jnp.float32)},
        "time": {"in": _lin(sd, "adaln_single.emb.timestep_embedder.linear_1",
                            jnp.float32),
                 "out": _lin(sd, "adaln_single.emb.timestep_embedder.linear_2",
                             jnp.float32)},
        "adaln_single": _lin(sd, "adaln_single.linear", jnp.float32),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[blk(i) for i in range(L)]),
        "final_mod": jnp.asarray(np.asarray(sd["scale_shift_table"], np.float32)),
        "final_out": _lin(sd, "proj_out", jnp.float32),
    }


def load_osp_checkpoint(ckpt_dir: str, cfg):
    return convert_osp_state_dict(load_safetensors_dir(ckpt_dir), cfg)

# --------------------------------------------------------------------------
# OmniGen2 (published OmniGen2/OmniGen2 `transformer/` naming — Lumina2
# lineage; call structure transcribed in MagCache4OmniGen2/magcache/
# magcache_utils.py:94-246, block/key naming from the omnigen2 package's
# diffusers-style Omnigen2Transformer2DModel)
# --------------------------------------------------------------------------

def _zlin(sd, name, dtype, d_out=None):
    """Like `_lin` but zero-fills a missing bias so the tree matches
    `linear_params(bias=True)` initializations."""
    p = _lin(sd, name, dtype)
    if "b" not in p and d_out is not None:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def convert_omnigen2_state_dict(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Map an OmniGen2 transformer state dict onto `init_omnigen2_params`.

    Key layout:
      time_caption_embed.timestep_embedder.linear_{1,2}
      time_caption_embed.caption_embedder.{0 (RMSNorm), 1 (Linear)}
      x_embedder / ref_image_patch_embedder
      {context_refiner,noise_refiner,ref_image_refiner,layers}.{i}.
        attn.{to_q,to_k,to_v,to_out.0,norm_q,norm_k}
        feed_forward.linear_{1 (gate),2 (down),3 (up)}
        norm1.linear + norm1.norm (modulated) | norm1 (plain RMSNorm)
        norm2 / ffn_norm1 / ffn_norm2
      norm_out.linear_{1 (temb scale),2 (projection)}
    to_k/to_v concatenate into our fused GQA ``kv``.
    """
    dt = cfg.jdtype

    def group(prefix, depth, modulated):
        def one(i):
            b = f"{prefix}.{i}"
            kv_w = np.concatenate(
                [np.asarray(sd[f"{b}.attn.to_{n}.weight"], np.float32).T
                 for n in "kv"], axis=1)
            p = {
                "q": _lin(sd, f"{b}.attn.to_q", dt),
                "kv": {"w": jnp.asarray(kv_w, dt)},
                "o": _lin(sd, f"{b}.attn.to_out.0", dt),
                "q_norm": jnp.asarray(sd[f"{b}.attn.norm_q.weight"], jnp.float32),
                "k_norm": jnp.asarray(sd[f"{b}.attn.norm_k.weight"], jnp.float32),
                "norm2": jnp.asarray(sd[f"{b}.norm2.weight"], jnp.float32),
                "ffn_norm1": jnp.asarray(sd[f"{b}.ffn_norm1.weight"], jnp.float32),
                "ffn_norm2": jnp.asarray(sd[f"{b}.ffn_norm2.weight"], jnp.float32),
                "w1": _lin(sd, f"{b}.feed_forward.linear_1", dt),
                "w3": _lin(sd, f"{b}.feed_forward.linear_3", dt),
                "w2": _lin(sd, f"{b}.feed_forward.linear_2", dt),
            }
            if f"{b}.attn.to_k.bias" in sd:
                p["kv"]["b"] = jnp.asarray(np.concatenate(
                    [np.asarray(sd[f"{b}.attn.to_{n}.bias"], np.float32)
                     for n in "kv"]), dt)
            if modulated:
                p["mod"] = _zlin(sd, f"{b}.norm1.linear", jnp.float32,
                                 4 * cfg.hidden)
                p["norm1"] = jnp.asarray(sd[f"{b}.norm1.norm.weight"],
                                         jnp.float32)
            else:
                p["norm1"] = jnp.asarray(sd[f"{b}.norm1.weight"], jnp.float32)
            return p

        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[one(i) for i in range(depth)])

    return {
        "t_embed": {
            "in": _lin(sd, "time_caption_embed.timestep_embedder.linear_1",
                       jnp.float32),
            "out": _lin(sd, "time_caption_embed.timestep_embedder.linear_2",
                        jnp.float32),
        },
        "cap_norm": jnp.asarray(
            sd["time_caption_embed.caption_embedder.0.weight"], jnp.float32),
        "cap_proj": _lin(sd, "time_caption_embed.caption_embedder.1",
                         jnp.float32),
        "x_embed": _lin(sd, "x_embedder", cfg.jdtype),
        "ref_embed": _lin(sd, "ref_image_patch_embedder", cfg.jdtype),
        "context_refiner": group("context_refiner", cfg.refiner_layers, False),
        "noise_refiner": group("noise_refiner", cfg.refiner_layers, True),
        "ref_refiner": group("ref_image_refiner", cfg.refiner_layers, True),
        "layers": group("layers", cfg.layers, True),
        "norm_out_mod": _lin(sd, "norm_out.linear_1", jnp.float32),
        "final_out": _lin(sd, "norm_out.linear_2", jnp.float32),
    }


def sniff_omnigen2_config(sd: Dict[str, np.ndarray], *, patch: int = 2,
                          dtype: str = "float32"):
    """Infer OmniGen2Config structural fields from the checkpoint's own
    shapes (NOTES.md "Known gaps" #1 — the key layout was transcribed from
    the public omnigen2 package without the real file):

    hidden/text_dim/temb widths from the embedders, layer counts from the
    max ``layers.N`` / ``noise_refiner.N`` indices, head geometry from
    norm_q (head_dim) and to_q/to_k widths, exact SwiGLU inner width from
    feed_forward.linear_1. ``patch`` comes from config.json when present
    (shape-ambiguous: x_embedder folds in_channels * patch^2)."""
    import re as _re

    from magcache_tpu.models.omnigen2 import OmniGen2Config

    def shape(k):
        return tuple(np.asarray(sd[k]).shape)

    hidden, pin = shape("x_embedder.weight")
    head_dim = shape("layers.0.attn.norm_q.weight")[0]
    heads = shape("layers.0.attn.to_q.weight")[0] // head_dim
    kv_heads = shape("layers.0.attn.to_k.weight")[0] // head_dim
    assert heads * head_dim == hidden, (heads, head_dim, hidden)

    def depth(prefix):
        pat = _re.compile(rf"{prefix}\.(\d+)\.")
        idxs = [int(m.group(1)) for k in sd for m in [pat.match(k)] if m]
        return max(idxs) + 1 if idxs else 0

    temb_dim, time_embed_dim = shape(
        "time_caption_embed.timestep_embedder.linear_1.weight")
    ffn_dim = shape("layers.0.feed_forward.linear_1.weight")[0]
    d3 = head_dim // 3
    return OmniGen2Config(
        hidden=hidden, heads=heads, kv_heads=kv_heads,
        layers=depth("layers"), refiner_layers=depth("noise_refiner"),
        in_channels=pin // (patch * patch), patch=patch,
        text_dim=shape("time_caption_embed.caption_embedder.1.weight")[1],
        time_embed_dim=time_embed_dim, temb_dim=temb_dim,
        axes_dims=(head_dim - 2 * d3, d3, d3),
        ffn_dim_override=ffn_dim, dtype=dtype)


def omnigen2_config_from_json(d: dict, dtype: str = "float32"):
    """OmniGen2Config from a diffusers-style transformer ``config.json``
    (tolerant to the Lumina2-lineage key-name variants)."""
    from magcache_tpu.models.omnigen2 import OmniGen2Config

    def pick(*names, default=None):
        for n in names:
            if n in d and d[n] is not None:
                return d[n]
        return default

    base = OmniGen2Config()
    hidden = pick("hidden_size", "dim", default=base.hidden)
    heads = pick("num_attention_heads", "n_heads", default=base.heads)
    axes = pick("axes_dim_rope", "axes_dims_rope", "axes_dims",
                default=list(base.axes_dims))
    kw = dict(
        hidden=hidden, heads=heads,
        kv_heads=pick("num_kv_heads", "n_kv_heads", default=base.kv_heads),
        layers=pick("num_layers", "n_layers", "num_hidden_layers",
                    default=base.layers),
        refiner_layers=pick("num_refiner_layers",
                            default=base.refiner_layers),
        in_channels=pick("in_channels", default=base.in_channels),
        patch=pick("patch_size", default=base.patch),
        text_dim=pick("text_feat_dim", "cap_feat_dim", default=base.text_dim),
        axes_dims=tuple(axes), eps=pick("norm_eps", default=base.eps),
        dtype=dtype)
    mult = pick("ffn_dim_multiplier")
    if mult:
        kw["ffn_mult"] = mult
    return OmniGen2Config(**kw)


def load_omnigen2_checkpoint(ckpt_dir: str, cfg=None, dtype: str = "float32",
                             lora_path: str = None, lora_scale: float = 1.0):
    """Convert an OmniGen2 transformer directory. With ``cfg=None``:
    ``config.json`` (if present) supplies patch/axes/eps, then the weight
    shapes are sniffed as ground truth for every structural field.
    ``lora_path`` folds a LoRA adapter into the weights before conversion
    (the reference's ``--transformer_lora_path`` ->
    ``pipeline.load_lora_weights``, ``inference.py:36,204-206``)."""
    sd = load_safetensors_dir(ckpt_dir)
    if lora_path:
        from magcache_tpu.models.lora import load_lora_file, merge_lora_state_dict
        sd, n = merge_lora_state_dict(sd, load_lora_file(lora_path),
                                      scale=lora_scale)
        print(f"merged LoRA adapter {lora_path} into {n} layers")
    if cfg is None:
        import json as _json
        import os as _os
        jpath = _os.path.join(ckpt_dir, "config.json")
        patch, axes, eps = 2, None, None
        if _os.path.exists(jpath):
            with open(jpath) as f:
                jcfg = omnigen2_config_from_json(_json.load(f), dtype=dtype)
            patch, axes, eps = jcfg.patch, jcfg.axes_dims, jcfg.eps
        cfg = sniff_omnigen2_config(sd, patch=patch, dtype=dtype)
        if axes is not None:
            import dataclasses as _dc
            cfg = _dc.replace(cfg, axes_dims=tuple(axes), eps=eps)
    return convert_omnigen2_state_dict(sd, cfg), cfg
