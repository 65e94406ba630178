"""Reference CLI flag-surface parity: alias flags map onto the same config
fields the canonical flags drive (no generation — parser + config wiring only).

Reference surfaces covered:
- HunyuanVideo hyvideo args (magcache_sample_video.py): --video_size H W,
  --video_length, --infer_steps, --neg_prompt, --cfg_scale,
  --embedded_cfg_scale, --flow_shift, --save_path
- OmniGen2 inference.py: --negative_prompt, --text_guidance_scale,
  --image_guidance_scale, --cfg_range_start/end, --teacache_rel_l1_thresh
"""

import jax
import numpy as np

from magcache_tpu.cli.generate import (
    _hunyuan_pipeline,
    _omnigen2_pipeline,
    build_parser,
)


def _parse(argv):
    return build_parser().parse_args(argv)


def test_hunyuan_alias_flags_map_to_config():
    args = _parse([
        "--task", "hunyuanvideo", "--tiny", "--prompt", "x",
        "--video_size", "544", "960", "--video_length", "129",
        "--infer_steps", "30", "--embedded_cfg_scale", "6.0",
        "--flow_shift", "9.0",
    ])
    pipe, cfg = _hunyuan_pipeline(args)
    assert cfg.steps == 30
    assert cfg.guidance == 6.0
    assert cfg.flow_shift == 9.0
    # tiny clamps the spatial size; non-tiny path maps H W -> height/width
    args2 = _parse([
        "--task", "hunyuanvideo", "--prompt", "x",
        "--video_size", "544", "960",
    ])
    # build only the config fields we care about without instantiating the
    # full-size model: the preset choice keys off height
    assert args2.video_size == [544, 960]


def test_hunyuan_video_length_sets_window():
    args = _parse([
        "--task", "hunyuanvideo", "--prompt", "x", "--tiny",
        "--video_length", "129",
    ])
    _, cfg = _hunyuan_pipeline(args)
    # tiny forces window 2; the alias still must not crash and the
    # non-tiny formula is (129-1)//4+1 = 33
    assert cfg.latent_window_size == 2


def test_omnigen2_alias_flags_map_to_config():
    args = _parse([
        "--task", "omnigen2", "--tiny", "--prompt", "x",
        "--text_guidance_scale", "4.0", "--image_guidance_scale", "1.5",
        "--cfg_range_start", "0.1", "--cfg_range_end", "0.8",
        "--enable_teacache", "--teacache_rel_l1_thresh", "0.07",
    ])
    pipe, cfg = _omnigen2_pipeline(args)
    assert cfg.text_guidance_scale == 4.0
    assert cfg.image_guidance_scale == 1.5
    assert cfg.cfg_range == (0.1, 0.8)
    assert cfg.enable_teacache and cfg.teacache_thresh == 0.07


def test_omnigen2_taylorseer_excludes_teacache(capsys):
    args = _parse([
        "--task", "omnigen2", "--tiny", "--prompt", "x",
        "--enable_taylorseer", "--enable_teacache",
    ])
    _, cfg = _omnigen2_pipeline(args)
    out = capsys.readouterr().out
    assert "mutually exclusive" in out
    assert cfg.enable_taylorseer and not cfg.enable_teacache


def test_wan22_parity_flags_accepted():
    args = _parse([
        "--task", "ti2v-5B", "--prompt", "x", "--convert_model_dtype",
        "--offload_model", "True", "--t5_cpu",
    ])
    assert args.convert_model_dtype


def test_omnigen2_inference_alias_surface():
    # inference.py flag names canonicalize in main() — check the parser
    # accepts them and the mapping logic is importable (no generation)
    args = _parse([
        "--task", "omnigen2", "--tiny",
        "--instruction", "a fox", "--num_inference_step", "7",
        "--seed", "3", "--enable_magcache", "--scheduler", "euler",
        "--output_image_path", "/tmp/x", "--height", "64", "--width", "32",
        "--enable_model_cpu_offload", "--max_input_image_pixels", "1048576",
    ])
    assert args.instruction == "a fox"
    assert args.num_inference_step == 7
    assert args.enable_magcache


def test_image_to_grid_latent_vae_paths():
    # SD VAE: [-1,1] preprocessing + to_latent shift/scale must be applied;
    # Wan video VAE: needs the singleton frame axis (5-D input)
    import numpy as np

    from magcache_tpu.cli.generate import _image_to_grid_latent
    from magcache_tpu.models.vae_sd import SDVAE, SDVAEConfig, init_sd_vae_params
    from magcache_tpu.models.vae_wan import (
        WanVAE,
        WanVAEConfig,
        init_wan_vae_params,
    )

    class P:    # minimal pipe stand-in
        pass

    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)

    scfg = SDVAEConfig.tiny(shift_factor=0.1)
    p = P()
    p.vae = SDVAE(scfg, init_sd_vae_params(jax.random.PRNGKey(0), scfg))
    h_lat = 32 // scfg.spatial_down
    lat = _image_to_grid_latent(p, img, h_lat, h_lat, scfg.z_channels)
    assert lat.shape == (h_lat, h_lat, scfg.z_channels)
    # to_latent applied: the raw posterior mean differs by shift/scale
    enc = p.vae.encode((img * 2 - 1)[None])
    mean = enc[0] if isinstance(enc, (tuple, list)) else enc
    raw = np.asarray(mean)[0]
    assert not np.allclose(raw, lat)

    wcfg = WanVAEConfig.tiny()
    p = P()
    p.vae = WanVAE(wcfg, init_wan_vae_params(jax.random.PRNGKey(1), wcfg))
    lat = _image_to_grid_latent(p, img, 16, 16, wcfg.z_channels)
    assert lat.shape == (16, 16, wcfg.z_channels)
    assert np.isfinite(lat).all()

    # no VAE: mock path is shape-correct and channel-tiled
    p = P()
    lat = _image_to_grid_latent(p, img, 8, 8, 16)
    assert lat.shape == (8, 8, 16)


def test_t5_ckpt_reaches_t5_conditioned_families(tmp_path):
    """--t5_ckpt builds a real encoder on the latte/cogvideox/open-sora/OSP
    builders (reference: every VideoSys pipeline loads its own T5/mt5 —
    pipeline_latte.py:220, pipeline_open_sora_plan.py:278-283)."""
    import pytest
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.cli.generate import (_latte_pipeline,
                                           _open_sora_plan_pipeline)
    from magcache_tpu.models.text import JaxT5Encoder

    with torch.no_grad():
        tm = transformers.MT5EncoderModel(transformers.MT5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_heads=4, relative_attention_num_buckets=8)).eval()
        tm.save_pretrained(tmp_path, safe_serialization=False)

    args = _parse(["--task", "latte", "--tiny", "--prompt", "x",
                   "--t5_ckpt", str(tmp_path)])
    pipe, cfg = _latte_pipeline(args)
    assert isinstance(pipe.text_encoder, JaxT5Encoder)
    args = _parse(["--task", "open-sora-plan", "--tiny", "--prompt", "x",
                   "--t5_ckpt", str(tmp_path)])
    pipe, cfg = _open_sora_plan_pipeline(args)
    assert isinstance(pipe.text_encoder, JaxT5Encoder)


def test_dash_spelled_flags_normalize():
    # the hyvideo reference scripts register dashed flags
    # (magcache_sample_video.py: --video-size/--infer-steps/--flow-shift);
    # _normalize_argv maps the dash spelling onto the underscore parser
    from magcache_tpu.cli.generate import _normalize_argv
    argv = _normalize_argv([
        "--task", "hunyuan", "--tiny",
        "--video-size", "544", "960", "--infer-steps", "50",
        "--flow-shift", "7.0", "--neg-prompt", "bad", "--save-path", "/tmp/x",
    ])
    args = _parse(argv)
    assert args.video_size == [544, 960]
    assert args.infer_steps == 50
    assert args.flow_shift == 7.0
    assert args.neg_prompt == "bad"
    assert args.save_path == "/tmp/x"
    # values and =-joined flags pass through untouched
    assert _normalize_argv(["--magcache_thresh=0.12", "framepack-f1"]) == [
        "--magcache_thresh=0.12", "framepack-f1"]


def test_ti2v_cli_routing():
    """ti2v-5B: i2v ratio table only when an image conditions the run (the
    reference's img-is-not-None switch, Wan2.2 magcache_generate.py:735-738);
    guide scale defaults to the ti2v_5B config's 5.0 unless given."""
    from magcache_tpu.cli.generate import _wan_pipeline

    args = _parse(["--task", "ti2v-5B", "--tiny", "--prompt", "x"])
    pipe, cfg = _wan_pipeline(args)
    assert cfg.model == "wan2.2-ti2v-5B-t2v"
    assert cfg.task == "ti2v"
    assert cfg.guide_scale == 5.0

    args = _parse(["--task", "ti2v-5B", "--tiny", "--prompt", "x",
                   "--image", "img.png"])
    _, cfg = _wan_pipeline(args)
    assert cfg.model == "wan2.2-ti2v-5B-i2v"

    args = _parse(["--task", "ti2v-5B", "--tiny", "--prompt", "x",
                   "--sample_guide_scale", "4.0"])
    _, cfg = _wan_pipeline(args)
    assert cfg.guide_scale == 4.0


def test_save_media_writes_video_and_image(tmp_path):
    """The CLI writes decoded media next to the latents (the reference CLIs'
    save_video/save_videos_grid step) with per-family fps; single-frame
    videos and .image outputs become stills."""
    from magcache_tpu.cli.generate import _save_media
    from magcache_tpu.pipelines.base import PipelineOutput

    vid = (np.random.default_rng(0).random((5, 16, 16, 3)) * 255
           ).astype(np.uint8)
    out = PipelineOutput(latents=None, video=vid)
    _save_media("t2v-1.3B", out, str(tmp_path / "v"))
    assert (tmp_path / "v.mp4").exists() or (tmp_path / "v.npy").exists()

    out_img = PipelineOutput(latents=None, image=vid[0])
    _save_media("flux-dev", out_img, str(tmp_path / "i"))
    assert (tmp_path / "i.png").exists() or (tmp_path / "i.npy").exists()

    # single-frame video -> still
    out_t2i = PipelineOutput(latents=None, video=vid[:1])
    _save_media("qwen-image", out_t2i, str(tmp_path / "s"))
    assert (tmp_path / "s.png").exists() or (tmp_path / "s.npy").exists()

    # no decoded media -> no-op
    _save_media("t2v-1.3B", PipelineOutput(latents=None), str(tmp_path / "n"))
    assert not list(tmp_path.glob("n.*"))


def test_image_family_default_canvas():
    """Bare flux/qwen tasks use the family's reference canvas, not the Wan
    832*480 size default (diffusers FluxPipeline 1024^2; QwenImage 16:9
    1664x928, magcache_generate.py:287-296); explicit --size wins."""
    from magcache_tpu.cli.generate import _flux_pipeline, _qwen_pipeline

    args = _parse(["--task", "flux-dev", "--tiny", "--prompt", "x"])
    args.tiny = False
    import magcache_tpu.pipelines.flux as F
    import magcache_tpu.pipelines.qwen_image as Q
    captured = {}

    class _Stub:
        def __init__(self, cfg, **kw):
            captured["cfg"] = cfg
    orig_f, F.FluxPipeline = F.FluxPipeline, _Stub
    orig_q, Q.QwenImagePipeline = Q.QwenImagePipeline, _Stub
    try:
        _flux_pipeline(args)
        assert (captured["cfg"].width, captured["cfg"].height) == (1024, 1024)
        args2 = _parse(["--task", "flux-dev", "--prompt", "x",
                        "--size", "512*768"])
        _flux_pipeline(args2)
        assert (captured["cfg"].width, captured["cfg"].height) == (512, 768)
        args3 = _parse(["--task", "qwen-image", "--prompt", "x"])
        _qwen_pipeline(args3)
        assert (captured["cfg"].width, captured["cfg"].height) == (1664, 928)
    finally:
        F.FluxPipeline, Q.QwenImagePipeline = orig_f, orig_q


def test_framepack_vs_hunyuan_defaults():
    """FramePack tasks default to the demo's 25 steps / gs 10.0; hunyuan
    keeps hyvideo's 50 / 6.0 (magcache_demo_gradio.py sliders vs hyvideo
    args)."""
    args = _parse(["--task", "framepack", "--tiny", "--prompt", "x"])
    _, cfg = _hunyuan_pipeline(args)
    assert cfg.steps == 25 and cfg.guidance == 10.0
    args = _parse(["--task", "hunyuanvideo", "--tiny", "--prompt", "x"])
    _, cfg = _hunyuan_pipeline(args)
    assert cfg.steps == 50 and cfg.guidance == 6.0


def test_flux_guidance_defaults():
    """flux-dev embedded guidance 3.5, Kontext 2.5
    (magcache_flux_kontext.py:478); --sample_guide_scale overrides."""
    from magcache_tpu.cli.generate import _flux_pipeline
    import magcache_tpu.pipelines.flux as F
    captured = {}

    class _Stub:
        def __init__(self, cfg, **kw):
            captured["cfg"] = cfg
    orig, F.FluxPipeline = F.FluxPipeline, _Stub
    try:
        for argv, want in (
                (["--task", "flux-dev", "--tiny", "--prompt", "x"], 3.5),
                (["--task", "flux-kontext-dev", "--tiny", "--prompt", "x"],
                 2.5),
                (["--task", "flux-dev", "--tiny", "--prompt", "x",
                  "--sample_guide_scale", "4.5"], 4.5)):
            _flux_pipeline(_parse(argv))
            assert captured["cfg"].guidance == want
    finally:
        F.FluxPipeline = orig


def test_cogvideox_dynamic_cfg_and_latte_clean_caption_routing():
    from magcache_tpu.cli.generate import _cogvideox_pipeline, _latte_pipeline
    args = _parse(["--task", "cogvideox", "--tiny", "--prompt", "x",
                   "--use_dynamic_cfg", "--sample_steps", "4"])
    pipe, cfg = _cogvideox_pipeline(args)
    assert cfg.use_dynamic_cfg is True
    args2 = _parse(["--task", "latte", "--tiny", "--prompt", "x",
                    "--clean_caption", "--sample_steps", "4"])
    pipe2, cfg2 = _latte_pipeline(args2)
    assert cfg2.clean_caption is True
    # defaults stay off (reference kwarg defaults)
    args3 = _parse(["--task", "latte", "--tiny", "--prompt", "x"])
    _, cfg3 = _latte_pipeline(args3)
    assert cfg3.clean_caption is False


def test_load_frames_pixel_video_and_mask(tmp_path):
    """VACE --src_video/--src_mask accept pixel video files (snapshot
    follow-up): frames come back [F, H, W, 3] in [0, 1] at the pipeline
    canvas, and pixel masks reduce to [F, H, W]."""
    import imageio
    import numpy as np

    from magcache_tpu.cli.generate import _load_frames

    frames = [np.full((32, 64, 3), v, np.uint8) for v in (0, 128, 255)]
    p = tmp_path / "src.gif"
    imageio.mimwrite(str(p), frames)

    class Cfg:
        size = (64, 32)          # (W, H)

    class Pipe:
        config = Cfg()

    out = _load_frames(str(p), Pipe())
    assert out.shape == (3, 32, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert out[0].mean() < 0.02 and out[2].mean() > 0.98

    m = out.mean(axis=-1)
    assert m.shape == (3, 32, 64)

    # .npy passthrough
    arr = np.random.default_rng(0).random((2, 8, 8, 3)).astype(np.float32)
    np.save(tmp_path / "lat.npy", arr)
    np.testing.assert_array_equal(
        _load_frames(str(tmp_path / "lat.npy"), Pipe()), arr)
