"""CLI mirroring the reference adapters' argument surface.

Flag names follow ``MagCache4Wan2.1/magcache_generate.py:745-788`` (task /
size / frame_num / sample_steps / sample_shift / sample_solver /
sample_guide_scale / base_seed / use_magcache / magcache_thresh / magcache_K /
retention_ratio / magcache_calibration) so reference users' invocations map
1:1. Output file naming encodes the E/K/R triple like the reference
(``magcache_generate.py:1190-1194``).

Examples:
  python -m magcache_tpu.cli.generate --task t2v-1.3B --size 832*480 \
      --sample_steps 50 --use_magcache --magcache_thresh 0.12 --magcache_K 2
  python -m magcache_tpu.cli.generate --task flux-dev --size 1024*1024 \
      --sample_steps 28 --use_magcache
Add ``--tiny`` for a checkpoint-free smoke run at toy sizes.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("magcache_tpu generate")
    p.add_argument("--task", default="t2v-1.3B",
                   help="t2v-1.3B | t2v-14B | i2v-14B | flf2v-14B | ti2v-5B | "
                        "vace-1.3B | "
                        "flux-dev | flux-kontext-dev | qwen-image | "
                        "hunyuan-720p | framepack | open-sora | "
                        "open-sora-plan | cogvideox | latte | vchitect | "
                        "omnigen2 | ...")
    p.add_argument("--size", default=None,
               help="W*H pixels (unset = per-family reference default: wan/hunyuan/open-sora 832*480, flux 1024*1024, qwen 1664*928, omnigen2 1024*1024)")
    p.add_argument("--frame_num", type=int, default=None,
               help="unset = per-task reference default (wan 81, ti2v-5B 121)")
    p.add_argument("--sample_steps", type=int, default=None)
    p.add_argument("--sample_shift", type=float, default=None)
    p.add_argument("--sample_solver", default="unipc",
                   choices=["unipc", "dpm++", "euler"],
                   help="reference choices unipc/dpm++ "
                        "(magcache_generate.py:728-731); euler kept for "
                        "FramePack-style paths")
    # None = resolve the family's reference default (Wan magcache CLI 5.0,
    # qwen true_cfg 4.0, hyvideo embedded 6.0, open-sora 7.0, cogvideox 6.0,
    # latte/vchitect/OSP 7.5)
    p.add_argument("--sample_guide_scale", type=float, default=None)
    p.add_argument("--base_seed", type=int, default=0)
    p.add_argument("--prompt", default="Two anthropomorphic cats in comfy "
                   "boxing gear and bright gloves fight intensely on a "
                   "spotlighted stage.")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--src_video", default=None,
                   help="VACE conditioning video .npy [F, H, W, 3] in [0,1]")
    p.add_argument("--src_mask", default=None,
                   help="VACE mask .npy [F, H, W] in [0,1]")
    p.add_argument("--src_ref_images", default=None,
                   help="vace R2V: comma-separated reference image paths "
                        "(magcache_generate.py:1096; prepended latent frames, "
                        "trimmed after sampling)")
    # reference-CLI compatibility aliases (torch memory/FSDP management —
    # no-ops under the single-controller TPU runtime: weights are already
    # mesh-sharded via --tp/--sp, and there is no host<->device offload cycle)
    p.add_argument("--t5_fsdp", action="store_true",
                   help="accepted for parity; T5 shards over the mesh instead")
    p.add_argument("--dit_fsdp", action="store_true",
                   help="accepted for parity; DiT shards over the mesh instead")
    p.add_argument("--offload_model", type=str, default=None,
                   help="accepted for parity; no host offload cycle on TPU")
    p.add_argument("--t5_cpu", action="store_true",
                   help="accepted for parity; no-op")
    p.add_argument("--use_prompt_extend", action="store_true",
                   help="extend the prompt with a local HF causal-LM "
                        "(--prompt_extend_model); falls back to the raw "
                        "prompt when unavailable (reference falls back too, "
                        "magcache_generate.py:956-976)")
    p.add_argument("--prompt_extend_model", default=None,
                   help="local HF dir for the prompt expander LM")
    p.add_argument("--prompt_extend_method", default="local_qwen",
                   help="accepted for parity (dashscope needs egress; only "
                        "local_qwen is meaningful here)")
    p.add_argument("--prompt_extend_target_lang", default="en",
                   help="accepted for parity")
    p.add_argument("--first_frame", default=None,
                   help="flf2v: first-frame image (png/jpg/npy)")
    p.add_argument("--last_frame", default=None,
                   help="flf2v: last-frame image (png/jpg/npy)")
    p.add_argument("--image", default=None,
                   help="input image for i2v / edit tasks (png/jpg via PIL, "
                        "or .npy [H, W, 3]) — the reference's --image flag")
    p.add_argument("--vae_ckpt", default=None,
                   help="VAE checkpoint (safetensors): Wan VAE for wan tasks, "
                        "diffusers AutoencoderKL for image-family tasks")
    p.add_argument("--clip_ckpt", default=None,
                   help="CLIP vision tower safetensors for i2v conditioning")
    p.add_argument("--t5_ckpt", default=None,
                   help="T5/umt5 encoder HF dir (weights + tokenizer) — the "
                        "wan/open-sora text stack, run natively in JAX; "
                        "umt5 checkpoints (per-layer relative bias, wan's "
                        "real encoder) are auto-detected and routed to the "
                        "native UMT5 tower")
    p.add_argument("--llm_ckpt", default=None,
                   help="llava-llama text encoder HF dir — the hyvideo "
                        "conditioning stack for hunyuan/framepack tasks")
    p.add_argument("--clip_text_ckpt", default=None,
                   help="CLIP-L text model HF dir — the pooled vector for "
                        "flux/hunyuan/framepack tasks; with --clip_text_ckpt2 "
                        "+ --t5_ckpt on vchitect, the SD3 triple-encoder "
                        "stack")
    p.add_argument("--clip_text_ckpt2", default=None,
                   help="CLIP-bigG text model HF dir (vchitect/SD3 "
                        "text_encoder_2)")
    p.add_argument("--txt_len", type=int, default=None,
                   help="override the text-conditioning sequence length "
                        "(e.g. 1024 for qwen-image-edit with a large "
                        "condition image — diffusers tokenizer_max_length)")
    p.add_argument("--save_file", default=None)
    # MagCache triple (reference flags)
    p.add_argument("--use_magcache", action="store_true")
    p.add_argument("--magcache_thresh", type=float, default=None)
    p.add_argument("--magcache_K", type=int, default=None)
    p.add_argument("--retention_ratio", type=float, default=None)
    p.add_argument("--cache_policy", choices=("adapter", "rolling"),
                   default="adapter",
                   help="MagCache decision rule: the release adapter rule, "
                        "or the Wan eval scripts' rolling variant that "
                        "produced the published VBench numbers "
                        "(wan_magcache.py:683-817; wan tasks only)")
    p.add_argument("--magcache_calibration", action="store_true")
    p.add_argument("--enable_teacache", action="store_true",
                   help="TeaCache comparator on Wan tasks (per-lane even/odd "
                        "accumulators, reference wan_teacache.py:533-590)")
    p.add_argument("--teacache_thresh", type=float, default=None,
                   help="0.1 ~ 2.0x, 0.2 ~ 3.0x; default 0.2 on Wan "
                        "(wan_teacache.py:749-752), 0.15 on framepack")
    p.add_argument("--use_ret_steps", action="store_true",
                   help="retention-steps TeaCache variant: e0 signal + "
                        "longer forced warmup (wan_teacache.py:759-762)")
    p.add_argument("--negative_prompt", default=None,
                   help="negative prompt (omnigen2 surface; other pipelines "
                        "use their reference default)")
    p.add_argument("--text_guidance_scale", type=float, default=None,
                   help="omnigen2 text CFG scale (inference.py)")
    p.add_argument("--image_guidance_scale", type=float, default=None,
                   help="omnigen2 image CFG scale")
    p.add_argument("--cfg_range_start", type=float, default=None,
                   help="omnigen2 step-fraction window start for guidance")
    p.add_argument("--cfg_range_end", type=float, default=None,
                   help="omnigen2 step-fraction window end for guidance")
    p.add_argument("--teacache_rel_l1_thresh", type=float, default=None,
                   help="omnigen2 alias for the TeaCache threshold")
    p.add_argument("--convert_model_dtype", action="store_true",
                   help="accepted for parity (Wan2.2 flag); --dtype governs")
    # HunyuanVideo reference surface (magcache_sample_video.py / hyvideo args)
    p.add_argument("--video_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="hunyuan alias: height width (maps to --size W*H)")
    p.add_argument("--video_length", type=int, default=None,
                   help="hunyuan alias for --frame_num")
    p.add_argument("--infer_steps", type=int, default=None,
                   help="hunyuan alias for --sample_steps")
    p.add_argument("--neg_prompt", default=None,
                   help="hunyuan alias for --negative_prompt")
    p.add_argument("--cfg_scale", type=float, default=None,
                   help="hunyuan classifier-free guidance scale (1.0 on the "
                        "distilled model = disabled, the reference default)")
    p.add_argument("--embedded_cfg_scale", type=float, default=None,
                   help="hunyuan embedded (distilled) guidance scale")
    p.add_argument("--flow_shift", type=float, default=None,
                   help="hunyuan flow-match shift (alias of --sample_shift "
                        "for the hunyuan/framepack tasks)")
    p.add_argument("--save_path", default=None,
                   help="alias for --save_file")
    # OmniGen2 inference.py surface (reference flag names map onto the
    # shared canonical flags)
    p.add_argument("--instruction", default=None,
                   help="omnigen2 alias for --prompt")
    p.add_argument("--input_image_path", default=None, nargs="+",
                   help="omnigen2 alias for --image (first path used; the "
                        "edit task conditions on one reference image)")
    p.add_argument("--output_image_path", default=None,
                   help="omnigen2 alias for --save_file")
    p.add_argument("--height", type=int, default=None,
                   help="omnigen2 alias: output height (with --width)")
    p.add_argument("--width", type=int, default=None,
                   help="omnigen2 alias: output width (with --height)")
    p.add_argument("--num_inference_step", type=int, default=None,
                   help="omnigen2 alias for --sample_steps")
    p.add_argument("--seed", type=int, default=None,
                   help="alias for --base_seed")
    p.add_argument("--enable_magcache", action="store_true",
                   help="omnigen2 alias for --use_magcache")
    p.add_argument("--scheduler", default=None,
                   choices=["euler", "dpmsolver++"],
                   help="omnigen2 scheduler (inference.py:41-47): euler "
                        "(default) or flow-match DPM-Solver++ 2M")
    p.add_argument("--num_images_per_prompt", type=int, default=None,
                   help="accepted for parity; batched sampling rides the dp "
                        "mesh axis (generate_batch) instead")
    p.add_argument("--max_input_image_pixels", type=int, default=None,
                   help="accepted for parity (input images are resized to "
                        "the model grid)")
    p.add_argument("--model_path", default=None,
                   help="omnigen2 alias for --ckpt_dir")
    p.add_argument("--transformer_path", default=None,
                   help="omnigen2 alias for --ckpt_dir (transformer dir)")
    p.add_argument("--transformer_lora_path", default=None,
                   help="LoRA adapter (PEFT/kohya layout) merged into the "
                        "transformer weights before jit "
                        "(omnigen2 inference.py:36,204-206; also flux)")
    p.add_argument("--lora_scale", type=float, default=1.0,
                   help="scale for --transformer_lora_path (the PEFT "
                        "lora_scale, magcache_flux.py:62-75)")
    p.add_argument("--enable_model_cpu_offload", action="store_true",
                   help="accepted for parity; no host offload cycle on TPU")
    p.add_argument("--enable_sequential_cpu_offload", action="store_true",
                   help="accepted for parity; no-op")
    p.add_argument("--enable_group_offload", action="store_true",
                   help="accepted for parity; no-op")
    p.add_argument("--vae_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="Wan VAE conv compute dtype: float32 (default, "
                        "official numerics) or bfloat16 (MXU fast path, "
                        "~3x faster decode; norm stats stay f32)")
    p.add_argument("--enable_taylorseer", action="store_true",
                   help="TaylorSeer forecasting comparator (omnigen2 task; "
                        "mutually exclusive with --use_magcache, reference "
                        "MagCache4OmniGen2/inference.py:167-212)")
    p.add_argument("--mag_ratios_json", default=None,
                   help="path to a calibration-mode *_mag_ratio.json; its "
                        "ratios replace the preset's published array")
    # parallel plan
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    # reference xfuser flag aliases (magcache_generate.py:637-641): both map
    # onto the sp mesh axis; --ring_size additionally selects the ring
    # attention implementation (ppermute K/V rotation)
    p.add_argument("--ulysses_size", type=int, default=None,
                   help="alias: sp with Ulysses attention (default impl)")
    p.add_argument("--ring_size", type=int, default=None,
                   help="alias: sp with ring attention")
    # hyvideo parallel/runtime spellings (magcache_sample_video.py CLI):
    # *-degree = xfuser degrees -> sp axis; flow-reverse is hyvideo's
    # standard t:1->0 generation direction (our flow-match sampler's only
    # direction); cpu offload is unnecessary under mesh sharding
    p.add_argument("--ulysses_degree", type=int, default=None,
                   help="hyvideo alias for --ulysses_size")
    p.add_argument("--ring_degree", type=int, default=None,
                   help="hyvideo alias for --ring_size (>1 selects ring)")
    p.add_argument("--flow_reverse", action="store_true",
                   help="hyvideo parity flag (accepted; this sampler always "
                        "integrates t 1->0)")
    p.add_argument("--use_cpu_offload", action="store_true",
                   help="hyvideo parity no-op (TPU mesh sharding instead)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--tiny", action="store_true",
                   help="toy-size model for checkpoint-free smoke runs")
    p.add_argument("--enable_pab", action="store_true",
                   help="Pyramid Attention Broadcast (open-sora task)")
    p.add_argument("--use_dynamic_cfg", action="store_true",
                   help="cogvideox: per-step cosine-ramped guidance scale "
                        "(pipeline_cogvideox.py:501)")
    # Open-Sora conditioning surface (pipeline_open_sora.py:426-456)
    p.add_argument("--resolution", default=None,
                   help="open-sora bucket resolution (480p, 720p, ...); "
                        "overrides --size via the training bucket tables")
    p.add_argument("--aspect_ratio", default=None,
                   help="open-sora bucket aspect ratio (9:16, 16:9, ...)")
    p.add_argument("--loop", type=int, default=1,
                   help="open-sora looped generation count")
    p.add_argument("--ms", "--mask_strategy", dest="ms", default="",
                   help="open-sora mask strategy "
                        "'loop,ref,ref_start,target_start,len,edit_ratio;...'")
    p.add_argument("--refs", "--reference_path", dest="refs", default="",
                   help="open-sora reference paths (';'-separated .npy "
                        "latents or images)")
    p.add_argument("--aes", type=float, default=6.5,
                   help="aesthetic score appended to the prompt")
    p.add_argument("--flow_score", type=float, default=None,
                   help="motion score appended to the prompt")
    p.add_argument("--camera_motion", default=None,
                   help="camera motion tag appended to the prompt")
    p.add_argument("--condition_frame_length", type=int, default=5,
                   help="latent frames handed to the next loop")
    p.add_argument("--condition_frame_edit", type=float, default=0.0,
                   help="edit ratio of the hand-off frames")
    p.add_argument("--align", type=int, default=5,
                   help="mask-strategy index alignment")
    p.add_argument("--no_text_preprocessing", action="store_true",
                   help="skip the T5 caption cleaning")
    p.add_argument("--clean_caption", action="store_true",
                   help="latte: apply the deepfloyd T5 caption cleaning "
                        "(pipeline_latte.py:296 kwarg, default off)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon sitecustomize "
                        "force-registers the TPU; env vars don't override it)")
    return p


def _parse_size(size, default_wh):
    """``--size W*H`` -> (w, h); unset (None) -> the family's reference
    default canvas. An explicit value always wins, even when it equals a
    family default."""
    if size is None:
        return default_wh
    w, h = (int(v) for v in size.split("*"))
    return w, h


def _wan_pipeline(args):
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    w, h = _parse_size(args.size, (832, 480))
    preset = {
        "t2v-1.3B": "wan2.1-t2v-1.3B", "t2v-14B": "wan2.1-t2v-14B",
        "t2i-14B": "wan2.1-t2v-14B",   # t2i = single-frame t2v (reference task)
        "i2v-14B": "wan2.1-i2v-480p" if h <= 480 else "wan2.1-i2v-720p",
        # flf2v shares the i2v architecture/size table; the reference CLI runs
        # it full-compute (no published ratios, magcache_generate.py:1032-1090)
        "flf2v-14B": "wan2.1-i2v-480p" if h <= 480 else "wan2.1-i2v-720p",
        # ti2v picks the i2v ratio table when an image conditions the run
        # (the reference's img-is-not-None switch, Wan2.2
        # magcache_generate.py:735-738)
        "ti2v-5B": ("wan2.2-ti2v-5B-i2v" if getattr(args, "image", None)
                    else "wan2.2-ti2v-5B-t2v"),
        "t2v-A14B": "wan2.2-t2v-A14B", "i2v-A14B": "wan2.2-i2v-A14B",
        "vace-1.3B": "wan2.1-vace-1.3B", "vace-14B": "wan2.1-vace-14B",
    }[args.task]
    # Wan2.2 per-task defaults — the wan.configs values the reference falls
    # back to when flags are omitted (_validate_args, Wan2.2
    # magcache_generate.py:409-419: steps/shift/guide/frame_num <- cfg.*)
    wan22 = {
        "t2v-A14B": dict(steps=40, shift=12.0, guide=(3.0, 4.0), frames=81),
        "i2v-A14B": dict(steps=40, shift=5.0, guide=(3.5, 3.5), frames=81),
        "ti2v-5B": dict(steps=50, shift=5.0, guide=5.0, frames=121),
    }.get(args.task)
    if args.frame_num is None:
        args.frame_num = wan22["frames"] if wan22 else 81
    if args.tiny:
        w, h, args.frame_num = 64, 32, 9
    if args.task.startswith("t2i"):
        args.frame_num = 1
    guide = args.sample_guide_scale
    if guide is None:
        # Wan2.1 magcache CLI default 5.0 (magcache_generate.py:741-744);
        # Wan2.2 tasks resolve wan.configs values
        guide = wan22["guide"] if wan22 else 5.0
    cfg = WanPipelineConfig(
        model=preset,
        task=("flf2v" if args.task.startswith("flf2v")
              else "ti2v" if args.task.startswith("ti2v")
              else "i2v" if args.task.startswith("i2v")
              else "vace" if args.task.startswith("vace") else "t2v"),
        size=(w, h), frame_num=args.frame_num,
        # Wan2.1 _validate_args defaults (magcache_generate.py:569-580):
        # steps 50 (i2v 40); shift 5.0, i2v@480-class 3.0, flf2v/vace 16
        sample_steps=args.sample_steps or (wan22["steps"] if wan22 else (
            40 if args.task.startswith("i2v") else 50)),
        sample_shift=args.sample_shift or (
            wan22["shift"] if wan22 else (
                3.0 if args.task.startswith("i2v") and min(w, h) <= 480
                else 16.0 if args.task.startswith(("flf2v", "vace"))
                else 5.0)),
        sample_solver=args.sample_solver,
        guide_scale=guide,
        use_magcache=args.use_magcache,
        magcache_thresh=args.magcache_thresh, magcache_K=args.magcache_K,
        retention_ratio=args.retention_ratio,
        cache_policy=getattr(args, "cache_policy", "adapter"),
        magcache_calibration=args.magcache_calibration,
        mag_ratios_override=_load_ratios(args),
        enable_teacache=getattr(args, "enable_teacache", False),
        teacache_thresh=(args.teacache_thresh
                         if getattr(args, "teacache_thresh", None) is not None
                         else 0.2),
        use_ret_steps=getattr(args, "use_ret_steps", False),
        dtype=args.dtype, dp=args.dp, sp=args.sp, tp=args.tp,
        ckpt_dir=args.ckpt_dir, clip_ckpt=args.clip_ckpt,
        vace_ref_images=(len(args.src_ref_images.split(","))
                         if getattr(args, "src_ref_images", None) else 0),
        tiny=args.tiny,
    )
    text = None
    t5_src = getattr(args, "t5_ckpt", None)
    if not t5_src and args.ckpt_dir:
        # the reference's single --ckpt_dir holds the encoder too
        # (models_t5_umt5-xxl-enc-*.pth, magcache_generate.py:884-893)
        import glob as _glob
        import os as _os
        if _glob.glob(_os.path.join(args.ckpt_dir, "*umt5*.pth")):
            t5_src = args.ckpt_dir
    if t5_src:
        from magcache_tpu.models.text import make_t5_encoder
        text = make_t5_encoder(t5_src, seq_len=cfg.model_config().text_len)
    return WanPipeline(cfg, text_encoder=text), cfg


def _extend_prompt(args):
    """Local prompt expansion (reference --use_prompt_extend flow,
    magcache_generate.py:956-976 — dashscope/local_qwen expander with
    fall-back to the raw prompt on failure; only the local path is possible
    in a zero-egress environment)."""
    if not getattr(args, "use_prompt_extend", False):
        return
    if not args.prompt_extend_model:
        print("WARNING: --use_prompt_extend needs --prompt_extend_model "
              "(local HF dir); keeping the original prompt.")
        return
    try:
        from transformers import AutoModelForCausalLM, AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.prompt_extend_model)
        model = AutoModelForCausalLM.from_pretrained(args.prompt_extend_model)
        ask = (f"Rewrite and enrich this video prompt in "
               f"{args.prompt_extend_target_lang}, adding vivid visual "
               f"detail. Reply with the prompt only.\n{args.prompt}")
        ids = tok(ask, return_tensors="pt")
        out = model.generate(**ids, max_new_tokens=256)
        ext = tok.decode(out[0][ids["input_ids"].shape[1]:],
                         skip_special_tokens=True).strip()
        if ext:
            print(f"prompt extended: {ext}")
            args.prompt = ext
    except Exception as e:      # reference logs + falls back (:961-968)
        print(f"Extending prompt failed: {e}. Falling back to original.")


def _load_ratios(args):
    if not args.mag_ratios_json:
        return None
    with open(args.mag_ratios_json) as f:
        return tuple(json.load(f))


def _real_encoders(args, txt_len: int):
    """Build real text encoders from --t5_ckpt/--llm_ckpt/--clip_text_ckpt
    (None entries fall back to the pipeline's mock). Matches the reference's
    encoder stacks: wan T5 (magcache_generate.py t5_checkpoint), hyvideo
    llava-llama + CLIP-L (magcache_sample_video.py:284-328), FLUX
    CLIP pooled + T5."""
    from magcache_tpu.models.text import (ClipTextEncoder, LlamaTextEncoder,
                                          make_t5_encoder)
    text = pooled = None
    if getattr(args, "t5_ckpt", None):
        text = make_t5_encoder(args.t5_ckpt, seq_len=txt_len)
    if getattr(args, "llm_ckpt", None):
        text = LlamaTextEncoder(args.llm_ckpt, out_len=txt_len)
    if getattr(args, "clip_text_ckpt", None):
        pooled = ClipTextEncoder(args.clip_text_ckpt)
    return text, pooled


def _t5_or_none(args, seq_len: int):
    """--t5_ckpt for the T5-conditioned video families (open-sora/cogvideox/
    latte T5-XXL, open-sora-plan v1.2 mt5-xxl — pipeline_open_sora_plan.py:
    204-208); None keeps the pipeline's mock encoder."""
    if not getattr(args, "t5_ckpt", None):
        return None
    from magcache_tpu.models.text import make_t5_encoder
    return make_t5_encoder(args.t5_ckpt, seq_len=seq_len)


def _flux_pipeline(args):
    from magcache_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig

    # unset --size = diffusers FluxPipeline default canvas (the reference
    # script passes no size, magcache_flux.py:479)
    w, h = _parse_size(args.size, (1024, 1024))
    if args.tiny:
        w = h = 64
    cfg = FluxPipelineConfig(
        model=args.task, height=h, width=w,
        # embedded guidance: flux-dev 3.5 (diffusers default); Kontext passes
        # 2.5 (magcache_flux_kontext.py:478)
        guidance=(args.sample_guide_scale if args.sample_guide_scale
                  is not None else (2.5 if "kontext" in args.task else 3.5)),
        num_inference_steps=args.sample_steps or 28,
        txt_len=8 if args.tiny else (args.txt_len or 512),
        use_magcache=args.use_magcache,
        magcache_thresh=args.magcache_thresh, magcache_K=args.magcache_K,
        retention_ratio=args.retention_ratio,
        magcache_calibration=args.magcache_calibration,
        dtype=args.dtype, dp=args.dp, sp=args.sp, tp=args.tp,
        ckpt_dir=args.ckpt_dir, tiny=args.tiny,
        lora_path=args.transformer_lora_path, lora_scale=args.lora_scale,
    )
    text, pooled = _real_encoders(args, cfg.txt_len)
    return FluxPipeline(cfg, text_encoder=text, pooled_encoder=pooled), cfg


def _qwen_pipeline(args):
    from magcache_tpu.pipelines.qwen_image import (
        QwenImagePipeline,
        QwenImagePipelineConfig,
    )
    # unset --size = the reference's 16:9 default canvas
    # (QwenImage magcache_generate.py:287-296)
    w, h = _parse_size(args.size, (1664, 928))
    if args.tiny:
        w = h = 64
    # an input image means the Edit pipeline (reference ships separate
    # MagCache4QwenImage / MagCache4QwenImageEdit adapters)
    model = args.task
    if args.image and "edit" not in model:
        model = "qwen-image-edit"
    cfg = QwenImagePipelineConfig(
        model=model, height=h, width=w,
        sample_steps=args.sample_steps or 50,
        # reference default true_cfg_scale=4.0 (QwenImageEdit
        # magcache_generate.py:283; QwenImage :30)
        true_cfg_scale=(4.0 if args.sample_guide_scale is None
                        else args.sample_guide_scale),
        txt_len=8 if args.tiny else (args.txt_len or 256),
        use_magcache=args.use_magcache,
        magcache_thresh=args.magcache_thresh, magcache_K=args.magcache_K,
        retention_ratio=args.retention_ratio,
        magcache_calibration=args.magcache_calibration,
        dtype=args.dtype, tiny=args.tiny, ckpt_dir=args.ckpt_dir)
    text = None
    if getattr(args, "llm_ckpt", None):
        if "edit" in model and args.image:
            # Edit's full stack: the reference image rides the chat template
            # through the Qwen2.5-VL vision tower (diffusers
            # QwenImageEditPipeline, drop_idx=64)
            from magcache_tpu.models.text import QwenVLTextEncoder
            # bound the condition image so its merged tokens + the prompt fit
            # the static txt_len (96 tokens reserved for prompt + specials)
            text = QwenVLTextEncoder(
                args.llm_ckpt, out_len=cfg.txt_len,
                max_pixels=max(56 * 56, (cfg.txt_len - 96) * 28 * 28))
            text.set_image(_load_image(args.image))
        else:
            # Qwen-Image's text-only stack: Qwen2.5-VL text tower + chat
            # template, drop_idx=34, final-normed last hidden state
            from magcache_tpu.models.text import (LlamaTextEncoder,
                                                  QWEN_IMAGE_CROP_START,
                                                  QWEN_IMAGE_PROMPT_TEMPLATE)
            text = LlamaTextEncoder(
                args.llm_ckpt, out_len=cfg.txt_len, skip_layers=0,
                template=QWEN_IMAGE_PROMPT_TEMPLATE,
                crop_start=QWEN_IMAGE_CROP_START)
    return QwenImagePipeline(cfg, text_encoder=text), cfg


def _hunyuan_pipeline(args):
    # HunyuanVideo rides the FramePack pipeline machinery with 1 section
    from magcache_tpu.pipelines.framepack import (
        FramePackPipeline,
        FramePackPipelineConfig,
    )
    if getattr(args, "video_size", None):
        h, w = args.video_size          # hyvideo orders height width
    else:
        w, h = _parse_size(args.size, (832, 480))
    frame_num = args.video_length or args.frame_num or 81
    # canonical flags win; aliases fill in when the canonical one is unset
    steps = args.sample_steps or args.infer_steps
    is_fp = args.task.startswith("framepack")
    if args.tiny:
        w = h = 64 if is_fp else 32     # pyramid needs 64-divisible sizes
    preset = "hunyuanvideo-720p" if h >= 700 else "hunyuanvideo-544p"
    guidance = args.sample_guide_scale
    if getattr(args, "embedded_cfg_scale", None) is not None:
        guidance = args.embedded_cfg_scale
    if guidance is None:
        # hyvideo --embedded_cfg_scale default 6.0; the FramePack demo's
        # distilled-guidance slider default is 10.0 (magcache_demo_gradio.py)
        guidance = 10.0 if is_fp else 6.0
    kw = {}
    shift = (args.sample_shift if args.sample_shift is not None
             else getattr(args, "flow_shift", None))
    if shift is not None:
        kw["flow_shift"] = shift
    cfg = FramePackPipelineConfig(
        model=preset if not is_fp else args.task,
        height=h, width=w,
        pyramid=is_fp,                   # plain Hunyuan has no clean pyramid
        latent_window_size=2 if args.tiny else (frame_num - 1) // 4 + 1,
        total_sections=1 if not is_fp else 5,
        # hyvideo --infer-steps default 50; FramePack demo steps default 25
        steps=steps or (25 if is_fp else 50),
        guidance=guidance,
        **kw,
        txt_len=8 if args.tiny else (args.txt_len or 256),
        use_magcache=args.use_magcache,
        magcache_thresh=args.magcache_thresh, magcache_K=args.magcache_K,
        retention_ratio=args.retention_ratio,
        use_teacache=getattr(args, "enable_teacache", False),
        teacache_thresh=getattr(args, "teacache_thresh", None),
        magcache_calibration=args.magcache_calibration,
        dtype=args.dtype, tiny=args.tiny, ckpt_dir=args.ckpt_dir)
    text, pooled = _real_encoders(args, cfg.txt_len)
    return FramePackPipeline(cfg, text_encoder=text, pooled_encoder=pooled), cfg


def _open_sora_pipeline(args):
    from magcache_tpu.pipelines.open_sora import (
        OpenSoraPipeline,
        OpenSoraPipelineConfig,
    )
    w, h = _parse_size(args.size, (832, 480))
    if args.tiny:
        w = h = 32
        args.frame_num = 8
    cfg = OpenSoraPipelineConfig(
        num_frames=args.frame_num or 81, height=h, width=w,
        resolution=getattr(args, "resolution", None),
        aspect_ratio=getattr(args, "aspect_ratio", None),
        num_sampling_steps=args.sample_steps or 30,
        cfg_scale=(7.0 if args.sample_guide_scale is None
                   else args.sample_guide_scale),  # OpenSoraConfig default
        magcache_calibration=args.magcache_calibration,
        caption_len=6 if args.tiny else (args.txt_len or 300),
        use_magcache=args.use_magcache,
        magcache_thresh=args.magcache_thresh, magcache_K=args.magcache_K,
        retention_ratio=args.retention_ratio,
        cache_policy=getattr(args, "cache_policy", "adapter"),
        enable_pab=getattr(args, "enable_pab", False),
        dtype=args.dtype, tiny=args.tiny, ckpt_dir=args.ckpt_dir)
    return OpenSoraPipeline(
        cfg, text_encoder=_t5_or_none(args, cfg.caption_len)), cfg


def _cogvideox_pipeline(args):
    from magcache_tpu.pipelines.cogvideox import (
        CogVideoXPipeline, CogVideoXPipelineConfig)
    kw = dict(num_inference_steps=args.sample_steps or 50,
              guidance_scale=(6.0 if args.sample_guide_scale is None
                              else args.sample_guide_scale),  # CogVideoXConfig default
              use_magcache=args.use_magcache,
              magcache_calibration=args.magcache_calibration,
              use_dynamic_cfg=getattr(args, 'use_dynamic_cfg', False),
              dtype=args.dtype, tiny=args.tiny,
              enable_pab=getattr(args, 'enable_pab', False))
    if args.magcache_thresh is not None:
        kw["magcache_thresh"] = args.magcache_thresh
    if args.magcache_K is not None:
        kw["magcache_K"] = args.magcache_K
    if args.retention_ratio is not None:
        kw["retention_ratio"] = args.retention_ratio
    if args.tiny:
        kw.update(num_frames=5, height=32, width=32)
    elif args.txt_len:
        kw["txt_len"] = args.txt_len
    kw["ckpt_dir"] = args.ckpt_dir
    cfg = CogVideoXPipelineConfig(**kw)
    return CogVideoXPipeline(
        cfg, text_encoder=_t5_or_none(args, cfg.txt_len)), cfg


def _latte_pipeline(args):
    from magcache_tpu.pipelines.latte import LattePipeline, LattePipelineConfig
    kw = dict(num_sampling_steps=args.sample_steps or 50,
              guidance_scale=(7.5 if args.sample_guide_scale is None
                              else args.sample_guide_scale),  # LatteConfig default
              use_magcache=args.use_magcache,
              magcache_calibration=args.magcache_calibration,
              clean_caption=getattr(args, 'clean_caption', False),
              dtype=args.dtype, tiny=args.tiny,
              enable_pab=getattr(args, 'enable_pab', False))
    if args.magcache_thresh is not None:
        kw["magcache_thresh"] = args.magcache_thresh
    if args.magcache_K is not None:
        kw["magcache_K"] = args.magcache_K
    if args.retention_ratio is not None:
        kw["retention_ratio"] = args.retention_ratio
    if args.tiny:
        kw.update(num_frames=4, height=64, width=64, caption_len=6)
    elif args.txt_len:
        kw["caption_len"] = args.txt_len
    kw["ckpt_dir"] = args.ckpt_dir
    cfg = LattePipelineConfig(**kw)
    return LattePipeline(
        cfg, text_encoder=_t5_or_none(args, cfg.caption_len)), cfg


def _vchitect_pipeline(args):
    from magcache_tpu.pipelines.vchitect import (
        VchitectPipeline, VchitectPipelineConfig)
    kw = dict(num_inference_steps=args.sample_steps or 100,
              guidance_scale=(7.5 if args.sample_guide_scale is None
                              else args.sample_guide_scale),  # VchitectConfig default
              use_magcache=args.use_magcache,
              magcache_calibration=args.magcache_calibration,
              dtype=args.dtype, tiny=args.tiny,
              enable_pab=getattr(args, 'enable_pab', False))
    if args.magcache_thresh is not None:
        kw["magcache_thresh"] = args.magcache_thresh
    if args.magcache_K is not None:
        kw["magcache_K"] = args.magcache_K
    if args.retention_ratio is not None:
        kw["retention_ratio"] = args.retention_ratio
    if args.tiny:
        kw.update(num_frames=4, height=32, width=32, txt_len=6)
    elif args.txt_len:
        kw["txt_len"] = args.txt_len
    kw["ckpt_dir"] = args.ckpt_dir
    text = pooled = None
    if (getattr(args, "clip_text_ckpt", None)
            and getattr(args, "clip_text_ckpt2", None)
            and getattr(args, "t5_ckpt", None)):
        # the SD3 triple-encoder recipe (pipeline_vchitect.py: CLIP-L +
        # CLIP-bigG penultimate states + projected pooled, T5 len 256)
        from magcache_tpu.models.text import (ClipTextEncoder, Sd3TextStack,
                                              make_t5_encoder)
        clip_l = ClipTextEncoder(args.clip_text_ckpt, hidden_skip=1,
                                 project=True)
        clip_g = ClipTextEncoder(args.clip_text_ckpt2, hidden_skip=1,
                                 project=True)
        t5_len = 256
        stack = Sd3TextStack(clip_l, clip_g,
                             make_t5_encoder(args.t5_ckpt, seq_len=t5_len))
        kw["txt_len"] = clip_l.seq_len + t5_len
        text, pooled = stack.context, stack.pooled
    cfg = VchitectPipelineConfig(**kw)
    return VchitectPipeline(cfg, text_encoder=text, pooled_encoder=pooled), cfg


def _open_sora_plan_pipeline(args):
    from magcache_tpu.pipelines.open_sora_plan import (
        OpenSoraPlanPipeline, OpenSoraPlanPipelineConfig)
    kw = dict(num_inference_steps=args.sample_steps or 150,
              guidance_scale=(7.5 if args.sample_guide_scale is None
                              else args.sample_guide_scale),  # OpenSoraPlanConfig default
              use_magcache=args.use_magcache,
              magcache_calibration=args.magcache_calibration,
              clean_caption=not getattr(args, 'no_text_preprocessing', False),
              dtype=args.dtype, tiny=args.tiny,
              enable_pab=getattr(args, 'enable_pab', False))
    if args.magcache_thresh is not None:
        kw["magcache_thresh"] = args.magcache_thresh
    if args.magcache_K is not None:
        kw["magcache_K"] = args.magcache_K
    if args.retention_ratio is not None:
        kw["retention_ratio"] = args.retention_ratio
    if args.tiny:
        kw.update(num_frames=5, height=32, width=32, caption_len=6)
    elif args.txt_len:
        kw["caption_len"] = args.txt_len
    kw["ckpt_dir"] = args.ckpt_dir
    cfg = OpenSoraPlanPipelineConfig(**kw)
    return OpenSoraPlanPipeline(
        cfg, text_encoder=_t5_or_none(args, cfg.caption_len)), cfg


def _omnigen2_pipeline(args):
    from magcache_tpu.pipelines.omnigen2 import (
        OmniGen2Pipeline, OmniGen2PipelineConfig)
    kw = dict(mode="t2i" if args.image is None else "edit",
              lora_path=args.transformer_lora_path,
              lora_scale=args.lora_scale,
              num_inference_steps=args.sample_steps or 50,
              use_magcache=args.use_magcache,
              magcache_calibration=args.magcache_calibration,
              enable_taylorseer=getattr(args, "enable_taylorseer", False),
              enable_teacache=getattr(args, "enable_teacache", False),
              dtype=args.dtype, tiny=args.tiny)
    if getattr(args, "teacache_thresh", None) is not None:
        kw["teacache_thresh"] = args.teacache_thresh
    if args.size is not None:
        # explicitly-set --size (or the --height/--width aliases) overrides
        # the omnigen2 reference default of 1024x1024
        w, h = (int(v) for v in args.size.split("*"))
        kw.update(height=h, width=w)
    if getattr(args, "teacache_rel_l1_thresh", None) is not None \
            and getattr(args, "teacache_thresh", None) is None:
        # reference flag name (OmniGen2 inference.py --teacache_rel_l1_thresh);
        # the canonical --teacache_thresh wins when both are given
        kw["teacache_thresh"] = args.teacache_rel_l1_thresh
    if getattr(args, "text_guidance_scale", None) is not None:
        kw["text_guidance_scale"] = args.text_guidance_scale
    if getattr(args, "image_guidance_scale", None) is not None:
        kw["image_guidance_scale"] = args.image_guidance_scale
    if getattr(args, "scheduler", None) is not None:
        kw["scheduler"] = args.scheduler
    if (getattr(args, "cfg_range_start", None) is not None
            or getattr(args, "cfg_range_end", None) is not None):
        lo = args.cfg_range_start if args.cfg_range_start is not None else 0.0
        hi = args.cfg_range_end if args.cfg_range_end is not None else 1.0
        kw["cfg_range"] = (lo, hi)
    if kw["enable_taylorseer"] and kw["enable_teacache"]:
        # reference warning verbatim semantics (inference.py:208-212)
        print("WARNING: enable_teacache and enable_taylorseer are mutually "
              "exclusive. enable_teacache will be ignored.")
        kw["enable_teacache"] = False
    if (kw["enable_taylorseer"] or kw["enable_teacache"]) and kw["use_magcache"]:
        print("WARNING: --use_magcache is ignored when a comparator cache "
              "is enabled (reference if/elif priority).")
        kw["use_magcache"] = False
    if args.magcache_thresh is not None:
        kw["magcache_thresh"] = args.magcache_thresh
    if args.magcache_K is not None:
        kw["magcache_K"] = args.magcache_K
    if args.retention_ratio is not None:
        kw["retention_ratio"] = args.retention_ratio
    n_refs = len(getattr(args, "input_image_path", None) or
                 ([args.image] if args.image else []))
    if n_refs:
        kw["ref_images"] = n_refs
    if args.tiny:
        kw.update(height=32, width=32, txt_len=6)
    elif args.txt_len:
        kw["txt_len"] = args.txt_len
    kw["ckpt_dir"] = args.ckpt_dir
    cfg = OmniGen2PipelineConfig(**kw)
    text = None
    if getattr(args, "llm_ckpt", None):
        # the reference conditions through `pipeline.mllm` — a Qwen2.5-VL LM
        # (inference.py:236); raw prompts, final-normed last hidden state
        # (the omnigen2 package's chat-template plumbing is external and not
        # verifiable offline — raw-prompt encoding documented deviation)
        from magcache_tpu.models.text import LlamaTextEncoder
        text = LlamaTextEncoder(args.llm_ckpt, out_len=cfg.txt_len,
                                skip_layers=0, template=None)
    return OmniGen2Pipeline(cfg, text_encoder=text), cfg


def _omnigen2_ref_latents(pipe, images):
    """Pixel reference images -> [1, R, gh*pp, gw*pp, c_in] latents (one
    `_image_to_grid_latent` per image)."""
    import jax.numpy as jnp
    gh, gw = pipe.grid
    pp = pipe.model_cfg.patch
    c_in = pipe.model_cfg.in_channels
    lats = [_image_to_grid_latent(pipe, img, gh * pp, gw * pp, c_in)
            for img in images]
    return jnp.asarray(np.stack(lats)[None], jnp.float32)


def _image_to_grid_latent(pipe, img, h_lat, w_lat, c_lat):
    """Pixel image -> [h_lat, w_lat, c_lat] conditioning latent.

    With a VAE attached (``--vae_ckpt``): pixels go to [-1, 1] (the diffusers
    preprocessing), video VAEs get a singleton frame axis, and SD-lineage
    VAEs apply their shift/scale (``to_latent``) so the latents match what
    the published transformers saw. Without a VAE: nearest-resize +
    channel-tile (shape-correct conditioning for checkpoint-free smoke runs
    only).
    """
    def resize(a, h, w):
        ys = (np.arange(h) * a.shape[0] // h).clip(0, a.shape[0] - 1)
        xs = (np.arange(w) * a.shape[1] // w).clip(0, a.shape[1] - 1)
        return a[ys][:, xs]

    vae = getattr(pipe, "vae", None)
    if vae is not None and hasattr(vae, "encode"):
        from magcache_tpu.models.vae import CausalVAE
        from magcache_tpu.models.vae_wan import WanVAE
        px = np.asarray(img, np.float32) * 2.0 - 1.0
        inp = (px[None, None] if isinstance(vae, (WanVAE, CausalVAE))
               else px[None])
        enc = vae.encode(inp)
        mean = enc[0] if isinstance(enc, (tuple, list)) else enc
        if hasattr(vae, "to_latent"):
            mean = vae.to_latent(mean)
        lat = np.asarray(mean)[0]
        if lat.ndim == 4:            # video VAE: [F, H, W, C] -> first frame
            lat = lat[0]
        if lat.shape[:2] != (h_lat, w_lat):
            lat = resize(lat, h_lat, w_lat)
        if lat.shape[-1] != c_lat:
            raise SystemExit(
                f"--image: the attached VAE produced {lat.shape[-1]} latent "
                f"channels but this model conditions on {c_lat} — wrong VAE "
                "for this task")
        return lat
    px = resize(np.asarray(img, np.float32), h_lat, w_lat)
    reps = -(-c_lat // px.shape[-1])
    return np.tile(px, (1, 1, reps))[:, :, :c_lat]


def _load_frames(path: str, pipe) -> np.ndarray:
    """VACE source video/mask: .npy loads as-is; pixel video/image files
    decode + resize_crop to the pipeline canvas, returned [F, H, W, 3] in
    [0, 1] (the ``encode_vace`` convention; reference feeds mp4s through
    wan.WanVace.prepare_source, ``magcache_generate.py:1091-1155``)."""
    if path.endswith(".npy"):
        return np.load(path)
    from magcache_tpu.pipelines.open_sora_cond import read_from_path

    w, h = pipe.config.size                 # Wan configs carry (W, H)
    return (read_from_path(path, (h, w)) + 1.0) / 2.0


def _load_image(path: str) -> np.ndarray:
    """Load an input image as [H, W, 3] float [0, 1]."""
    if path.endswith(".npy"):
        img = np.load(path)
    else:
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"))
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return img


def _normalize_argv(argv, parser=None):
    """Accept the hyvideo scripts' dash spelling (``--video-size``,
    ``--infer-steps``, ... — magcache_sample_video.py registers dashed
    flags) for every underscore-registered option.
    """
    known = set()
    for act in (parser or build_parser())._actions:
        known.update(act.option_strings)
    out = []
    for tok in argv:
        if tok.startswith("--") and "-" in tok[2:]:
            flag, eq, val = tok.partition("=")
            cand = "--" + flag[2:].replace("-", "_")
            if flag not in known and cand in known:
                tok = cand + eq + val
        out.append(tok)
    return out


def _save_media(task: str, out, save_file: str) -> None:
    """Write decoded media like the reference CLIs do; fps table shared with
    the HTTP server (``utils.misc.task_fps``)."""
    from magcache_tpu.utils.misc import save_image, save_video, task_fps
    if out.image is not None:
        p = save_image(np.asarray(out.image), save_file + ".png")
        print(f"image -> {p}")
        return
    if out.video is None:
        return
    vid = np.asarray(out.video)
    if vid.ndim == 5:       # [B, T, H, W, 3] -> first sample
        vid = vid[0]
    fps = task_fps(task)
    if vid.shape[0] == 1:   # single-frame (t2i) -> still image
        p = save_image(vid[0], save_file + ".png")
    else:
        p = save_video(vid, save_file + ".mp4", fps=fps)
    print(f"video -> {p}")


def build_pipeline(args):
    """Build the pipeline a parsed-args namespace selects.

    Dispatch mirrors the reference repo's per-adapter script split (one
    ``MagCache4<Family>`` directory per model family): the ``--task`` prefix
    picks the family builder. Returns ``(pipeline, pipeline_config, steps)``.
    Shared by ``generate`` and the serving endpoint (``cli/serve.py``).
    """
    _known = ("flux", "qwen", "hunyuan", "framepack", "open-sora",
              "cogvideox", "latte", "vchitect", "omnigen2",
              # wan task ids (the fallback family)
              "t2v", "t2i", "i2v", "flf2v", "ti2v", "vace")
    if not args.task.startswith(_known):
        raise SystemExit(
            f"--task {args.task!r} matches no model family; known prefixes: "
            f"{', '.join(_known)} (e.g. t2v-1.3B, flux-dev, open-sora)")
    if args.task.startswith("flux"):
        pipe, cfg = _flux_pipeline(args)
        steps = cfg.num_inference_steps
    elif args.task.startswith("qwen"):
        pipe, cfg = _qwen_pipeline(args)
        steps = cfg.sample_steps
    elif args.task.startswith("hunyuan") or args.task.startswith("framepack"):
        pipe, cfg = _hunyuan_pipeline(args)
        steps = cfg.steps
    elif args.task.startswith("open-sora-plan"):
        pipe, cfg = _open_sora_plan_pipeline(args)
        steps = cfg.num_inference_steps
    elif args.task.startswith("open-sora"):
        pipe, cfg = _open_sora_pipeline(args)
        steps = cfg.num_sampling_steps
    elif args.task.startswith("cogvideox"):
        pipe, cfg = _cogvideox_pipeline(args)
        steps = cfg.num_inference_steps
    elif args.task.startswith("latte"):
        pipe, cfg = _latte_pipeline(args)
        steps = cfg.num_sampling_steps
    elif args.task.startswith("vchitect"):
        pipe, cfg = _vchitect_pipeline(args)
        steps = cfg.num_inference_steps
    elif args.task.startswith("omnigen2"):
        pipe, cfg = _omnigen2_pipeline(args)
        steps = cfg.num_inference_steps
    else:
        pipe, cfg = _wan_pipeline(args)
        steps = cfg.sample_steps
    return pipe, cfg, steps


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    parser = build_parser()   # built once; parse_args does not mutate it
    args = parser.parse_args(_normalize_argv(list(argv), parser))
    parser_defaults = parser.parse_args(["--task", args.task])
    if getattr(args, "instruction", None) is not None \
            and args.prompt == parser_defaults.prompt:
        args.prompt = args.instruction
    if getattr(args, "input_image_path", None):
        # omnigen2 multi-image conditioning: every path becomes a reference
        # token block with its own rope grid (magcache_utils.py:352-369)
        args.image = args.image or args.input_image_path[0]
    if getattr(args, "output_image_path", None) and not args.save_file:
        args.save_file = args.output_image_path
    if getattr(args, "height", None) and getattr(args, "width", None) \
            and args.size is None:
        args.size = f"{args.width}*{args.height}"
    if getattr(args, "num_inference_step", None) and not args.sample_steps:
        args.sample_steps = args.num_inference_step
    if getattr(args, "seed", None) is not None \
            and args.base_seed == parser_defaults.base_seed:
        args.base_seed = args.seed
    if getattr(args, "enable_magcache", False):
        args.use_magcache = True

    for alias in ("model_path", "transformer_path"):
        if getattr(args, alias, None) and not args.ckpt_dir:
            args.ckpt_dir = getattr(args, alias)
    if getattr(args, "save_path", None) and not args.save_file:
        args.save_file = args.save_path
    if getattr(args, "neg_prompt", None) is not None \
            and args.negative_prompt is None:
        args.negative_prompt = args.neg_prompt
    if args.negative_prompt is not None and (
            args.task.startswith("hunyuan") or args.task.startswith("framepack")):
        print("WARNING: negative prompts need classifier-free guidance; the "
              "distilled Hunyuan/FramePack path runs one forward per step "
              "(magcache_sample_video.py:29-158) — --neg_prompt is ignored.")
    if getattr(args, "cfg_scale", None) not in (None, 1.0):
        print("WARNING: --cfg_scale != 1.0 requires an undistilled Hunyuan "
              "model; the MagCache adapter (and this port) run the distilled "
              "single-forward path (magcache_sample_video.py:29-158). "
              "Use --embedded_cfg_scale to steer.")
    if getattr(args, "ulysses_degree", None) and not args.ulysses_size:
        args.ulysses_size = args.ulysses_degree
    if getattr(args, "ring_degree", None) and args.ring_degree > 1 \
            and not args.ring_size:
        args.ring_size = args.ring_degree
    if args.ulysses_size:
        args.sp = args.ulysses_size
    if args.ring_size:
        args.sp = args.ring_size
        os.environ.setdefault("MAGCACHE_ATTN_IMPL", "ring")
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    t0 = time.time()
    pipe, cfg, steps = build_pipeline(args)
    if args.vae_ckpt:
        if not hasattr(pipe, "vae"):
            raise SystemExit(f"--vae_ckpt: task {args.task} has no VAE slot")
        if args.task.startswith(("t2v", "t2i", "i2v", "flf2v", "ti2v", "vace",
                                 "qwen")):
            # qwen-image ships the Wan-lineage 3-D causal VAE applied to
            # single-frame video (diffusers AutoencoderKLQwenImage)
            from magcache_tpu.models.vae_wan import load_wan_vae_checkpoint
            pipe.vae = load_wan_vae_checkpoint(
                args.vae_ckpt, dtype=getattr(args, "vae_dtype", None))
        elif args.task.startswith("cogvideox"):
            from magcache_tpu.models.vae_cogvideox import (
                CogVideoXVAE, CogVideoXVAEConfig, convert_cogvideox_vae_state_dict)
            from magcache_tpu.models.convert import load_safetensors_dir
            vcfg = CogVideoXVAEConfig()
            pipe.vae = CogVideoXVAE(vcfg, convert_cogvideox_vae_state_dict(
                load_safetensors_dir(args.vae_ckpt), vcfg))
        elif args.task.startswith("open-sora-plan"):
            from magcache_tpu.models.vae_osp import (
                OSPCausalVAE, load_osp_vae_checkpoint)
            vcfg, vparams = load_osp_vae_checkpoint(args.vae_ckpt)
            pipe.vae = OSPCausalVAE(vcfg, vparams)
        elif args.task.startswith("open-sora"):
            from magcache_tpu.models.vae_temporal import load_open_sora_vae
            pipe.vae = load_open_sora_vae(args.vae_ckpt)
        else:   # image families + latte/vchitect: diffusers AutoencoderKL
            from magcache_tpu.models.vae_sd import (
                SDVAE, load_sd_vae_checkpoint)
            vcfg, vparams = load_sd_vae_checkpoint(args.vae_ckpt)
            pipe.vae = SDVAE(vcfg, vparams)
    if getattr(args, "vae_dtype", None) and not args.vae_ckpt:
        from magcache_tpu.models.vae_wan import WanVAE as _WanVAE
        if isinstance(getattr(pipe, "vae", None), _WanVAE):
            import dataclasses as _dc
            pipe.vae = _WanVAE(
                _dc.replace(pipe.vae.cfg, dtype=args.vae_dtype),
                pipe.vae.params)
        else:
            print("WARNING: --vae_dtype only applies to the Wan VAE; this "
                  "pipeline has no Wan VAE attached (pass --vae_ckpt) — "
                  "flag ignored.")
    _extend_prompt(args)
    gen_kwargs = {}
    if getattr(args, "negative_prompt", None) is not None \
            and args.task.startswith("omnigen2"):
        gen_kwargs["negative_prompt"] = args.negative_prompt
    if args.task.startswith("omnigen2") and (
            args.image or getattr(args, "input_image_path", None)):
        paths = (getattr(args, "input_image_path", None)
                 or [args.image])
        gen_kwargs["ref_latents"] = _omnigen2_ref_latents(
            pipe, [_load_image(p) for p in paths])
        args.image = None   # consumed; don't pass the generic image kwarg
    if args.image and args.task.startswith("flux"):
        if "kontext" not in args.task:
            raise SystemExit("--image: only flux-kontext-dev conditions on "
                             "an input image (FLUX.1-dev is t2i; its weights "
                             "have no image-conditioning training)")
        # Kontext edit: packed conditioning latents ride the sequence
        from magcache_tpu.models.flux import pack_latents
        gh, gw = pipe.grid
        c_in = pipe.model_cfg.in_channels
        import jax.numpy as jnp
        lat = _image_to_grid_latent(pipe, _load_image(args.image),
                                    gh * 2, gw * 2, c_in // 4)
        gen_kwargs["cond_latents"] = np.asarray(
            pack_latents(jnp.asarray(lat, jnp.float32)[None]))
        args.image = None
    if args.image and args.task.startswith("qwen"):
        # qwen tokens are 2x2-packed VAE latents (in_channels = 16ch x 4),
        # same space-to-depth packing as flux
        from magcache_tpu.models.flux import pack_latents
        import jax.numpy as jnp
        gh, gw = pipe.grid
        c_in = pipe.model_cfg.in_channels
        lat = _image_to_grid_latent(pipe, _load_image(args.image),
                                    gh * 2, gw * 2, c_in // 4)
        gen_kwargs["ref_latents"] = np.asarray(
            pack_latents(jnp.asarray(lat, jnp.float32)[None]))
        args.image = None
    if args.image and (args.task.startswith("framepack")
                       or args.task.startswith("hunyuan")):
        hw = pipe.lat_shape[1:]
        lat = _image_to_grid_latent(pipe, _load_image(args.image),
                                    hw[0], hw[1], hw[2])
        gen_kwargs["start_latent"] = lat[None]
        args.image = None
    if args.task.startswith("open-sora") and not args.task.startswith(
            "open-sora-plan"):
        # conditioning image -> first-frame reference + mask strategy
        # (the reference README's i2v recipe: refs=image, ms='0,0,0,0,1,0')
        if args.image:
            hw = pipe.latent_shape[1:]
            lat = _image_to_grid_latent(pipe, _load_image(args.image),
                                        hw[0], hw[1], hw[2])
            # unique temp file: a fixed /tmp name is a concurrent-run and
            # symlink hazard (two runs would clobber each other's reference)
            import tempfile
            fd, ref_path = tempfile.mkstemp(prefix="opensora_i2v_ref_",
                                            suffix=".npy")
            os.close(fd)
            np.save(ref_path, lat[None])          # [T=1, H, W, C]
            args.refs = ref_path
            if not args.ms:
                args.ms = "0,0,0,0,1,0"
            args.image = None
        if args.refs and getattr(pipe, "vae", None) is None and any(
                not r.endswith(".npy") for r in args.refs.split(";") if r):
            # checkpoint-free smoke runs: pre-encode pixel refs with the
            # same nearest-resize mock --image uses (pipeline refs need a
            # real VAE otherwise)
            import tempfile

            from magcache_tpu.pipelines.open_sora_cond import (
                get_latent_t, read_from_path)
            hw, c_in = pipe.latent_shape[1:3], pipe.latent_shape[3]
            paths = []
            for r in args.refs.split(";"):
                if not r or r.endswith(".npy"):
                    paths.append(r)
                    continue
                frames = read_from_path(
                    r, (pipe.config.height, pipe.config.width))
                frames = (frames + 1.0) / 2.0            # mock takes [0, 1]
                idx = np.linspace(0, len(frames) - 1,
                                  get_latent_t(len(frames))).astype(int)
                lat = np.stack([
                    _image_to_grid_latent(pipe, frames[i], hw[0], hw[1], c_in)
                    for i in idx])
                fd, p = tempfile.mkstemp(prefix="opensora_ref_",
                                         suffix=".npy")
                os.close(fd)
                np.save(p, lat)                          # [T', H, W, C]
                paths.append(p)
            args.refs = ";".join(paths)
        gen_kwargs.update(
            loop=args.loop, ms=args.ms, refs=args.refs, aes=args.aes,
            flow=args.flow_score, camera_motion=args.camera_motion,
            condition_frame_length=args.condition_frame_length,
            condition_frame_edit=args.condition_frame_edit, align=args.align,
            use_text_preprocessing=not args.no_text_preprocessing)
    if args.image:
        gen_kwargs["image"] = _load_image(args.image)
    if getattr(args, "first_frame", None):
        gen_kwargs["image"] = _load_image(args.first_frame)
    if getattr(args, "last_frame", None):
        gen_kwargs["last_image"] = _load_image(args.last_frame)
    if getattr(args, "src_ref_images", None) and args.task.startswith("vace"):
        gen_kwargs["src_ref_images"] = [
            _load_image(p) for p in args.src_ref_images.split(",")]
    if args.src_video:
        gen_kwargs["src_video"] = _load_frames(args.src_video, pipe)
    if args.src_mask:
        m = _load_frames(args.src_mask, pipe)
        if m.ndim == 4:                     # pixel mask video -> [F, H, W]
            m = m.mean(axis=-1)
        gen_kwargs["src_mask"] = m
    if (args.task.startswith("qwen")
            and "edit" not in getattr(pipe.config, "model", "")):
        # qwen-image t2i appends the "positive magic" suffix (the Edit script
        # doesn't; QwenImage magcache_generate.py:278-299)
        args.prompt = args.prompt + ", Ultra HD, 4K, cinematic composition."
    out = pipe.generate(args.prompt, seed=args.base_seed, **gen_kwargs)
    dt = time.time() - t0

    E = args.magcache_thresh if args.magcache_thresh is not None else "def"
    K = args.magcache_K if args.magcache_K is not None else "def"
    R = args.retention_ratio if args.retention_ratio is not None else "def"
    taylorseer = getattr(args, "enable_taylorseer", False)
    teacache = getattr(args, "enable_teacache", False)
    if taylorseer:
        tag = "taylorseer"
    elif teacache:
        T = args.teacache_thresh if args.teacache_thresh is not None else "def"
        tag = f"teacache_T{T}" + (
            "_ret" if getattr(args, "use_ret_steps", False) else "")
    elif args.use_magcache:
        tag = f"magcache_E{E}_K{K}_R{R}"
    else:
        tag = "full"
    save_file = args.save_file or f"{args.task.replace('/', '_')}_{tag}_seed{args.base_seed}"

    if out.calibration is not None:
        for name in ("norm_ratio", "norm_std", "cos_dis"):
            print(name)
            print(out.calibration[name])
        with open(save_file + "_mag_ratio.json", "w") as f:
            json.dump(out.calibration["norm_ratio"], f)
        print(f"saved calibration to {save_file}_mag_ratio.json")
    else:
        lat = np.asarray(out.latents)
        np.save(save_file + "_latents.npy", lat)
        print(f"latents {lat.shape} -> {save_file}_latents.npy")
        _save_media(args.task, out, save_file)
    mode = ("taylorseer" if taylorseer else "teacache" if teacache
            else "magcache" if args.use_magcache else "full")
    print(f"done: {steps} steps in {dt:.1f}s "
          f"(sampling {out.timings['total_s']:.1f}s) mode={mode}")


if __name__ == "__main__":
    main()
