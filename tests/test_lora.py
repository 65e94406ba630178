"""LoRA adapter merging (reference: OmniGen2 ``--transformer_lora_path`` ->
``pipeline.load_lora_weights``, ``inference.py:36,204-206``; FLUX PEFT
``lora_scale``, ``magcache_flux.py:62-75``). The TPU translation folds
``scale * (alpha/r) * B @ A`` into the base weights once, pre-jit."""

import numpy as np
import pytest

from magcache_tpu.models.lora import load_lora_file, merge_lora_state_dict


def _base_sd():
    rng = np.random.default_rng(0)
    return {
        "layers.0.attn.to_q.weight": rng.normal(size=(8, 6)).astype(np.float32),
        "layers.0.attn.to_q.bias": np.zeros((8,), np.float32),
        "layers.1.ff.w1.weight": rng.normal(size=(10, 8)).astype(np.float32),
    }


def test_merge_peft_convention_with_alpha_prefix_and_scale():
    sd = _base_sd()
    rng = np.random.default_rng(1)
    A = rng.normal(size=(2, 6)).astype(np.float32)     # [r, in]
    B = rng.normal(size=(8, 2)).astype(np.float32)     # [out, r]
    lora = {
        "transformer.layers.0.attn.to_q.lora_A.weight": A,
        "transformer.layers.0.attn.to_q.lora_B.weight": B,
        "transformer.layers.0.attn.to_q.alpha": np.float32(4.0),
    }
    merged, n = merge_lora_state_dict(sd, lora, scale=0.5)
    assert n == 1
    want = sd["layers.0.attn.to_q.weight"] + 0.5 * (4.0 / 2) * (B @ A)
    np.testing.assert_allclose(merged["layers.0.attn.to_q.weight"], want,
                               rtol=1e-6)
    # untouched keys pass through by identity
    assert merged["layers.1.ff.w1.weight"] is sd["layers.1.ff.w1.weight"]


def test_merge_kohya_convention_no_alpha():
    sd = _base_sd()
    rng = np.random.default_rng(2)
    down = rng.normal(size=(3, 8)).astype(np.float32)
    up = rng.normal(size=(10, 3)).astype(np.float32)
    lora = {
        "layers.1.ff.w1.lora_down.weight": down,
        "layers.1.ff.w1.lora_up.weight": up,
    }
    merged, n = merge_lora_state_dict(sd, lora)
    assert n == 1
    np.testing.assert_allclose(merged["layers.1.ff.w1.weight"],
                               sd["layers.1.ff.w1.weight"] + up @ down,
                               rtol=1e-6)


def test_merge_strict_raises_on_unknown_target():
    sd = _base_sd()
    lora = {
        "nope.lora_A.weight": np.zeros((2, 4), np.float32),
        "nope.lora_B.weight": np.zeros((4, 2), np.float32),
    }
    with pytest.raises(KeyError):
        merge_lora_state_dict(sd, lora)
    merged, n = merge_lora_state_dict(sd, lora, strict=False)
    assert n == 0


def test_flux_checkpoint_lora_roundtrip(tmp_path):
    """load_flux_checkpoint(lora_path=...) == converting a hand-merged dict."""
    from safetensors.numpy import save_file

    from magcache_tpu.models.convert import (convert_flux_state_dict,
                                             load_flux_checkpoint)
    from magcache_tpu.models.flux import FluxConfig
    from tests.test_convert import _flux_tiny_sd

    cfg = FluxConfig.tiny()
    sd = _flux_tiny_sd(cfg, np.random.default_rng(3))
    ck = tmp_path / "ckpt"
    ck.mkdir()
    save_file({k: np.asarray(v) for k, v in sd.items()},
              str(ck / "diffusion_pytorch_model.safetensors"))

    tgt = next(k for k in sd if k.endswith(".weight")
               and np.asarray(sd[k]).ndim == 2)
    w = np.asarray(sd[tgt])
    rng = np.random.default_rng(4)
    A = rng.normal(size=(2, w.shape[1])).astype(np.float32)
    B = rng.normal(size=(w.shape[0], 2)).astype(np.float32)
    save_file({f"transformer.{tgt[:-7]}.lora_A.weight": A,
               f"transformer.{tgt[:-7]}.lora_B.weight": B},
              str(tmp_path / "adapter.safetensors"))

    got = load_flux_checkpoint(str(ck), cfg,
                               lora_path=str(tmp_path / "adapter.safetensors"),
                               lora_scale=0.7)
    sd2 = dict(sd)
    sd2[tgt] = w + 0.7 * (B @ A)
    want = convert_flux_state_dict(sd2, cfg)

    import jax
    flat_got = jax.tree_util.tree_leaves(got)
    flat_want = jax.tree_util.tree_leaves(want)
    assert any(
        not np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(convert_flux_state_dict(sd, cfg)),
            flat_got))                       # the adapter changed something
    for a, b in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_load_lora_file_formats(tmp_path):
    from safetensors.numpy import save_file

    d = {"x.lora_A.weight": np.ones((2, 3), np.float32)}
    save_file(d, str(tmp_path / "a.safetensors"))
    out = load_lora_file(str(tmp_path / "a.safetensors"))
    np.testing.assert_array_equal(out["x.lora_A.weight"], d["x.lora_A.weight"])
    # directory form picks the adapter file up
    out2 = load_lora_file(str(tmp_path))
    assert "x.lora_A.weight" in out2
