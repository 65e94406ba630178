"""End-to-end checkpoint plumbing: a reference-named safetensors file on disk
loads through `ckpt_dir` into a pipeline and generates (the reference's
`from_pretrained` flow, e.g. pipeline_latte.py:208)."""

import numpy as np
import pytest

from tests.test_convert import _rlin  # reference-named synthetic linears


def _write_latte_ckpt(tmp_path, cfg):
    from safetensors.numpy import save_file

    d = cfg.hidden
    mlp_d = cfg.mlp_ratio * d
    rng = np.random.default_rng(9)
    sd = {}
    sd["pos_embed.proj.weight"] = rng.normal(
        0, 0.05, (d, cfg.in_channels, cfg.patch, cfg.patch)).astype(np.float32)
    sd["pos_embed.proj.bias"] = rng.normal(0, 0.01, (d,)).astype(np.float32)
    _rlin(rng, sd, "caption_projection.linear_1", cfg.caption_dim, d)
    _rlin(rng, sd, "caption_projection.linear_2", d, d)
    _rlin(rng, sd, "adaln_single.emb.timestep_embedder.linear_1",
          cfg.time_embed_dim, d)
    _rlin(rng, sd, "adaln_single.emb.timestep_embedder.linear_2", d, d)
    _rlin(rng, sd, "adaln_single.linear", d, 6 * d)
    for pre, cross in (("transformer_blocks", True),
                       ("temporal_transformer_blocks", False)):
        for i in range(cfg.depth):
            b = f"{pre}.{i}"
            sd[f"{b}.scale_shift_table"] = rng.normal(
                0, 0.02, (6, d)).astype(np.float32)
            for n in "qkv":
                _rlin(rng, sd, f"{b}.attn1.to_{n}", d, d)
            _rlin(rng, sd, f"{b}.attn1.to_out.0", d, d)
            if cross:
                for n in "qkv":
                    _rlin(rng, sd, f"{b}.attn2.to_{n}", d, d)
                _rlin(rng, sd, f"{b}.attn2.to_out.0", d, d)
            _rlin(rng, sd, f"{b}.ff.net.0.proj", d, mlp_d)
            _rlin(rng, sd, f"{b}.ff.net.2", mlp_d, d)
    sd["scale_shift_table"] = rng.normal(0, 0.02, (2, d)).astype(np.float32)
    _rlin(rng, sd, "proj_out", d, cfg.patch * cfg.patch * cfg.c_out)
    path = tmp_path / "diffusion_pytorch_model.safetensors"
    save_file(sd, str(path))
    return str(tmp_path)


def test_latte_pipeline_loads_reference_named_checkpoint(tmp_path):
    from magcache_tpu.pipelines.latte import LattePipeline, LattePipelineConfig

    cfg = LattePipelineConfig(tiny=True, num_frames=4, height=64, width=64,
                              num_sampling_steps=2, caption_len=6)
    ckpt = _write_latte_ckpt(tmp_path, cfg.model_config())
    pipe = LattePipeline(
        LattePipelineConfig(tiny=True, num_frames=4, height=64, width=64,
                            num_sampling_steps=2, caption_len=6,
                            ckpt_dir=ckpt))
    out = pipe.generate("a paper boat on a stream", seed=0)
    assert np.isfinite(np.asarray(out.latents)).all()

    # loaded weights, not random init: trees differ
    rand = LattePipeline(cfg)
    a = np.asarray(pipe.params["adaln_single"]["w"])
    b = np.asarray(rand.params["adaln_single"]["w"])
    assert np.abs(a - b).max() > 1e-3


def test_cli_vae_ckpt_injects_sd_vae(tmp_path):
    """--vae_ckpt path: a diffusers-AutoencoderKL-named file loads via the
    shape-sniffing loader and decodes pipeline latents."""
    import jax

    from magcache_tpu.models.vae_sd import SDVAE, SDVAEConfig, load_sd_vae_checkpoint
    from tests.test_vae_sd import _synthetic_sd

    cfg = SDVAEConfig.tiny()
    tsd = _synthetic_sd(cfg, seed=5)
    from safetensors.numpy import save_file
    save_file({k: v.numpy() for k, v in tsd.items()},
              str(tmp_path / "vae.safetensors"))
    got_cfg, params = load_sd_vae_checkpoint(str(tmp_path / "vae.safetensors"))
    assert got_cfg.z_channels == cfg.z_channels
    assert got_cfg.ch_mult == cfg.ch_mult
    assert got_cfg.quant_conv == cfg.quant_conv
    vae = SDVAE(got_cfg, params)
    import jax.numpy as jnp
    y = vae.decode(jnp.ones((1, 4, 4, cfg.z_channels)))
    assert y.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(y)).all()
