"""Qwen2.5-VL conditioning stack parity — the Qwen-Image-Edit encoder
(reference: MagCache4QwenImageEdit patches the diffusers QwenImageEditPipeline
whose prompt encoder is Qwen2.5-VL; the image rides the chat template through
the vision tower and the LM runs with 3-axis M-RoPE)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from magcache_tpu.models.llama import (LlamaConfig,  # noqa: E402
                                       convert_llama_state_dict,
                                       llama_hidden_states)
from magcache_tpu.models.qwen_vl import (QwenVLVisionConfig,  # noqa: E402
                                         convert_qwen_vl_vision_state_dict,
                                         mrope_position_ids,
                                         patchify_qwen_vl,
                                         qwen_vl_vision_forward)

VIS_KW = dict(depth=4, hidden_size=32, num_heads=4, intermediate_size=48,
              out_hidden_size=24, patch_size=2, temporal_patch_size=2,
              spatial_merge_size=2, window_size=8,
              fullatt_block_indexes=[1, 3], in_channels=3, hidden_act="silu")


def _torch_vision(seed=0):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import \
        Qwen2_5_VLVisionConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import \
        Qwen2_5_VisionTransformerPretrainedModel
    torch.manual_seed(seed)
    return Qwen2_5_VisionTransformerPretrainedModel._from_config(
        Qwen2_5_VLVisionConfig(**VIS_KW)).eval().float()


def test_vision_tower_parity_vs_torch():
    """Grid 12x8 with window_size=8 exercises window padding, the window
    reorder/undo permutation, and both full- and window-attention layers."""
    with torch.no_grad():
        tm = _torch_vision()
        grid = torch.tensor([[1, 12, 8]])
        patches = torch.randn(96, 3 * 2 * 2 * 2)
        ref = tm(patches, grid_thw=grid).numpy()
    cfg = QwenVLVisionConfig.tiny()
    params = convert_qwen_vl_vision_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg)
    out = np.asarray(qwen_vl_vision_forward(
        params, cfg, jnp.asarray(patches.numpy()), ((1, 12, 8),)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_full_vl_stack_parity_vs_torch():
    """Vision embeds spliced at <|image_pad|> + M-RoPE LM == torch
    Qwen2_5_VLModel last_hidden_state (the Edit conditioning states)."""
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import \
        Qwen2_5_VLModel
    txt = dict(vocab_size=160, hidden_size=24, intermediate_size=48,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, rope_theta=1e6,
               max_position_embeddings=512,
               rope_scaling={"type": "mrope", "mrope_section": [1, 1, 1]})
    cfg = Qwen2_5_VLConfig(text_config=txt, vision_config=VIS_KW)
    cfg.image_token_id, cfg.video_token_id = 150, 151
    cfg.vision_start_token_id, cfg.vision_end_token_id = 148, 149
    with torch.no_grad():
        torch.manual_seed(0)
        tm = Qwen2_5_VLModel._from_config(cfg).eval().float()
        grid = torch.tensor([[1, 12, 8]])
        n_merged = 12 * 8 // 4
        patches = torch.randn(96, 3 * 2 * 2 * 2)
        ids = [7, 8, 9, 10, 11, 148] + [150] * n_merged + [149, 12, 13, 14]
        input_ids = torch.tensor([ids])
        mask = torch.ones_like(input_ids)
        ref = tm(input_ids=input_ids, attention_mask=mask,
                 pixel_values=patches,
                 image_grid_thw=grid).last_hidden_state.numpy()
        pos_ref, _ = tm.get_rope_index(input_ids, image_grid_thw=grid,
                                       attention_mask=mask)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    vcfg = QwenVLVisionConfig.tiny()
    img_embeds = qwen_vl_vision_forward(
        convert_qwen_vl_vision_state_dict(sd, vcfg), vcfg,
        jnp.asarray(patches.numpy()), ((1, 12, 8),))
    lcfg = LlamaConfig(vocab_size=160, hidden=24, layers=2, heads=4,
                       kv_heads=2, intermediate=48, rope_theta=1e6,
                       eps=cfg.text_config.rms_norm_eps, qkv_bias=True)
    lsd = {k[len("language_model."):]: v for k, v in sd.items()
           if k.startswith("language_model.")}
    lparams = convert_llama_state_dict(lsd, lcfg)

    ids_np = input_ids.numpy()
    pos = mrope_position_ids(ids_np, ((1, 12, 8),), 2, 150,
                             np.ones_like(ids_np))
    np.testing.assert_array_equal(pos, pos_ref.numpy())
    ov_mask = ids_np == 150
    ov = np.zeros(ids_np.shape + (24,), np.float32)
    ov[ov_mask] = np.asarray(img_embeds)
    h = llama_hidden_states(
        lparams, lcfg, jnp.asarray(ids_np),
        jnp.asarray(np.ones_like(ids_np)), final_norm=True,
        embeds_override=jnp.asarray(ov), override_mask=jnp.asarray(ov_mask),
        position_ids=jnp.asarray(pos), mrope_section=(1, 1, 1))
    np.testing.assert_allclose(np.asarray(h), ref, rtol=2e-4, atol=2e-4)


def test_patchify_matches_processor():
    """Our merge-block-major patch flattening == Qwen2VLImageProcessor's
    (resize/normalize disabled to isolate the layout)."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import \
        Qwen2VLImageProcessor
    rng = np.random.default_rng(0)
    img = rng.random((28, 56, 3)).astype(np.float32)   # 2x4 merged blocks
    proc = Qwen2VLImageProcessor(do_resize=False, do_rescale=False,
                                 do_normalize=False, patch_size=14,
                                 temporal_patch_size=2, merge_size=2)
    out = proc(images=[img], return_tensors="np")
    cfg = QwenVLVisionConfig(patch_size=14, temporal_patch_size=2,
                             merge_size=2)
    frames = np.repeat(img.transpose(2, 0, 1)[None], 2, axis=0)
    patches, grid = patchify_qwen_vl(frames, cfg)
    assert tuple(out["image_grid_thw"][0]) == grid
    np.testing.assert_allclose(patches, out["pixel_values"], atol=1e-6)


class _VLTok:
    """Fake tokenizer that understands the image-pad expansion: words hash to
    ids, <|image_pad|>/<|vision_start|>/<|vision_end|> map to the ids the
    encoder splices on."""

    def __call__(self, texts, padding=None, truncation=None, max_length=64,
                 return_tensors=None):
        ids = np.zeros((len(texts), max_length), np.int64)
        special = {"<|image_pad|>": 150, "<|vision_start|>": 148,
                   "<|vision_end|>": 149}
        for i, t in enumerate(texts):
            for tok, tid in special.items():
                t = t.replace(tok, f" @{tid} ")
            toks = []
            for w in t.split():
                if w.startswith("@"):
                    toks.append(int(w[1:]))
                else:
                    toks.append(3 + hash(w) % 90)
            toks = toks[:max_length]
            ids[i, :len(toks)] = toks
        return {"input_ids": ids,
                "attention_mask": (ids != 0).astype(np.int64)}


def test_qwen_vl_text_encoder_image_path():
    """QwenVLTextEncoder structural run: image set -> Edit template path
    (vision splice + M-RoPE), image cleared -> text-only path; both emit
    [B, out_len, hidden] and differ."""
    from magcache_tpu.models.text import QwenVLTextEncoder
    lcfg = LlamaConfig(vocab_size=160, hidden=24, layers=2, heads=4,
                       kv_heads=2, intermediate=48, rope_theta=1e6,
                       eps=1e-6, qkv_bias=True)
    enc = QwenVLTextEncoder(lcfg, out_len=40, tokenizer=_VLTok(),
                            mrope_section=(1, 1, 1), image_token_id=150,
                            min_pixels=16, max_pixels=256)
    img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
    # long enough that tokens survive the 64-token template crop under the
    # word-per-token fake tokenizer
    prompt = " ".join(f"blue{i}" for i in range(70))
    enc.set_image(img)
    with_img = enc([prompt])
    assert with_img.shape == (1, 40, 24)
    assert np.isfinite(np.asarray(with_img)).all()
    assert np.abs(np.asarray(with_img)).max() > 1e-3
    enc.set_image(None)
    text_only = enc([prompt])
    assert text_only.shape == (1, 40, 24)
    assert np.abs(np.asarray(with_img) - np.asarray(text_only)).max() > 1e-3


def test_vision_tower_multi_image_parity():
    """Two images with different grids in one call: per-image window offsets,
    seg_full isolation between images, and the global undo permutation."""
    with torch.no_grad():
        tm = _torch_vision(seed=1)
        grid = torch.tensor([[1, 4, 8], [1, 6, 4]])
        patches = torch.randn(4 * 8 + 6 * 4, 3 * 2 * 2 * 2)
        ref = tm(patches, grid_thw=grid).numpy()
    cfg = QwenVLVisionConfig.tiny()
    params = convert_qwen_vl_vision_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg)
    out = np.asarray(qwen_vl_vision_forward(
        params, cfg, jnp.asarray(patches.numpy()), ((1, 4, 8), (1, 6, 4))))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
