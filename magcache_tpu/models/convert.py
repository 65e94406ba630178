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

import jax.numpy as jnp
import numpy as np

__all__ = ["load_safetensors_dir", "convert_wan_state_dict",
           "load_wan_checkpoint", "convert_flux_state_dict",
           "load_flux_checkpoint", "save_params", "load_params"]


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load every *.safetensors under ``path`` into one flat numpy dict."""
    from safetensors import safe_open

    sd: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files and os.path.isfile(path):
        files = [path]
    assert files, f"no safetensors found under {path}"
    for f in files:
        with safe_open(f, framework="numpy") as fp:
            for k in fp.keys():
                sd[k] = fp.get_tensor(k)
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
    if cfg.model_type == "i2v":
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


def load_flux_checkpoint(ckpt_dir: str, cfg):
    return convert_flux_state_dict(load_safetensors_dir(ckpt_dir), cfg)


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
