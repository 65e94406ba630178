"""Open-Sora conditioning parity: masked-frame RFLOW, mask strategies, loop
generation, prompt preprocessing, and multi-resolution info.

Reference behavior: ``pipeline_open_sora.py:298-424,532-605,705-875`` and
``scheduling_rflow_open_sora.py:215-255``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.sampler import sample_rflow_masked
from magcache_tpu.models.stdit3 import (
    STDiT3Config,
    _pos_embed_2d,
    init_stdit3_params,
    make_stdit3_core,
)
from magcache_tpu.pipelines import open_sora_cond as oc
from magcache_tpu.pipelines.open_sora import (
    OpenSoraPipeline,
    OpenSoraPipelineConfig,
)
from magcache_tpu.schedulers.rflow import RFlowSchedule

CFG = STDiT3Config.tiny()
GRID = (3, 4, 4)
LAT = (3, 8, 8)
CAP = 6


# ---------------------------------------------------------------------------
# masked RFLOW sampler
# ---------------------------------------------------------------------------

def _masked_oracle(core, params, z0, cond, mask, ts, dts, noise_key, g):
    """Independent eager transcription of the reference sample loop
    (``scheduling_rflow_open_sora.py:215-255``): python for-loop, explicit
    noise bookkeeping, torch-style where() chain — shares only the model
    functions with the scanned implementation under test."""
    C = z0.shape[-1]
    z = jnp.asarray(z0)
    noise_added = np.asarray(mask) == 1.0
    for i, t in enumerate(ts):
        x0 = z
        mask_t = np.asarray(mask) * 1000.0
        upper = mask_t >= t                            # bool[B, T]
        add = upper & ~noise_added
        noise = jax.random.normal(jax.random.fold_in(noise_key, i),
                                  z.shape, z.dtype)
        tp = 1.0 - t / 1000.0
        x_noise = tp * x0 + (1.0 - tp) * noise
        z = jnp.where(jnp.asarray(add)[:, :, None, None, None], x_noise, x0)
        noise_added = upper

        z_in = jnp.concatenate([z, z], axis=0)
        tvec = jnp.full((2,), float(t), jnp.float32)
        c2 = dict(cond)
        c2["x_mask"] = jnp.concatenate(
            [jnp.asarray(upper)] * 2, axis=0)
        hidden, ctx = core.prepare(params, z_in, tvec, c2)
        out = core.head(params, core.trunk(params, hidden, ctx), ctx)
        pred_cond, pred_uncond = out[:1][..., :C], out[1:][..., :C]
        v = pred_uncond + g * (pred_cond - pred_uncond)
        z = z + float(dts[i]) * v
        z = jnp.where(jnp.asarray(upper)[:, :, None, None, None], z, x0)
    return np.asarray(z)


def test_masked_rflow_matches_oracle():
    params = init_stdit3_params(jax.random.PRNGKey(0), CFG)
    core = make_stdit3_core(CFG, GRID, CAP)
    rng = np.random.default_rng(3)
    f, h, w = LAT
    z0 = jnp.asarray(rng.normal(size=(1, f, h, w, CFG.in_channels)),
                     jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, CAP, CFG.caption_dim)),
                             jnp.float32),
            "fps": jnp.full((2,), 24.0, jnp.float32)}
    # frame 0: pure conditioning (1->mask 0), frame 1: edit ratio 0.5,
    # frame 2: free
    mask = jnp.asarray([[0.0, 0.5, 1.0]], jnp.float32)
    sch = RFlowSchedule.create(4)
    dts = np.array([sch.dt(i) for i in range(4)], np.float32)
    g = 7.0
    key = jax.random.PRNGKey(11)

    def comb(chunks):
        C = CFG.in_channels
        return chunks[1][..., :C] + g * (chunks[0][..., :C]
                                         - chunks[1][..., :C])

    got = np.asarray(sample_rflow_masked(
        core, params, z0, cond, timesteps=sch.timesteps, dts=dts,
        num_train_timesteps=1000, mask=mask, noise_key=key, lanes=2,
        combine_fn=comb))
    want = _masked_oracle(core, params, z0, cond, mask, sch.timesteps, dts,
                          key, g)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_conditioning_frames_survive_exactly():
    """mask==0 frames (i2v refs with edit_ratio 0) revert to the pasted
    latents after every step — the output carries them bit-exactly."""
    cfg = OpenSoraPipelineConfig(tiny=True, num_frames=8, height=32, width=32,
                                 num_sampling_steps=4, caption_len=6,
                                 dtype="float32")
    pipe = OpenSoraPipeline(cfg)
    T, H, W, C = pipe.latent_shape
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(1, H, W, C)).astype(np.float32)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ref.npy")
        np.save(p, ref)
        out = pipe.generate("a boat", refs=p, ms="0,0,0,0,1,0", align=1,
                            seed=0)
    lat = np.asarray(out.latents)
    np.testing.assert_array_equal(lat[0, 0], ref[0])
    # free frames must have moved away from the ref
    assert np.abs(lat[0, 1:] - ref[0]).max() > 1e-3


def test_loop_generation_shapes_and_handoff():
    cfg = OpenSoraPipelineConfig(tiny=True, num_frames=8, height=32, width=32,
                                 num_sampling_steps=3, caption_len=6,
                                 dtype="float32")
    pipe = OpenSoraPipeline(cfg)
    T = pipe.latent_shape[0]
    out = pipe.generate("a boat", loop=2, condition_frame_length=1, align=1,
                        seed=0)
    lat = np.asarray(out.latents)
    assert lat.shape[1] == 2 * T - 1      # clip2 trimmed by the hand-off frame
    assert np.isfinite(lat).all()


def test_masked_magcache_composes():
    cfg = OpenSoraPipelineConfig(tiny=True, num_frames=8, height=32, width=32,
                                 num_sampling_steps=6, caption_len=6,
                                 use_magcache=True, dtype="float32")
    pipe = OpenSoraPipeline(cfg)
    pipe.record_skips = True
    T, H, W, C = pipe.latent_shape
    ref = np.zeros((1, H, W, C), np.float32)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ref.npy")
        np.save(p, ref)
        out = pipe.generate("a boat", refs=p, ms="0,0,0,0,1,0", align=1,
                            seed=0)
    assert np.isfinite(np.asarray(out.latents)).all()
    assert out.skips is not None and np.asarray(out.skips).sum() > 0


# ---------------------------------------------------------------------------
# host helpers
# ---------------------------------------------------------------------------

def test_parse_mask_strategy_defaults_and_errors():
    assert oc.parse_mask_strategy("") == []
    assert oc.parse_mask_strategy(None) == []
    # single value fills the MASK_DEFAULT tail: loop 0, ref 0, starts 0,
    # length 1, edit 0
    assert oc.parse_mask_strategy("2") == [[2, 0, 0, 0, 1, 0.0]]
    assert oc.parse_mask_strategy("0,1,2,3,4,0.5;1") == [
        [0, 1, 2, 3, 4, 0.5], [1, 0, 0, 0, 1, 0.0]]
    with pytest.raises(AssertionError):
        oc.parse_mask_strategy("1,2,3,4,5,6,7")


def test_apply_mask_strategy_negative_and_align():
    z = np.zeros((1, 10, 2, 2, 1), np.float32)
    ref = np.arange(6, dtype=np.float32).reshape(6, 1, 1, 1) * np.ones(
        (6, 2, 2, 1), np.float32)
    # target -3 -> 7, align 2: 7//2=3, remainder 1 is not > point/2 -> 6
    m = oc.apply_mask_strategy(z, [[ref]], ["0,0,0,-3,2,0.25"], 0, align=2)
    assert m.shape == (1, 10)
    np.testing.assert_array_equal(np.where(m[0] == 0.25)[0], [6, 7])
    np.testing.assert_allclose(z[0, 6, 0, 0, 0], ref[0, 0, 0, 0])
    # other loop id: untouched
    m2 = oc.apply_mask_strategy(np.zeros_like(z), [[ref]],
                                ["1,0,0,0,2,0.25"], 0)
    assert (m2 == 1.0).all()


def test_find_nearest_point():
    # value // point, rounded up when remainder > point/2 (and not at the end)
    assert oc.find_nearest_point(7, 5, 100) == 5
    assert oc.find_nearest_point(8, 5, 100) == 10
    assert oc.find_nearest_point(99, 5, 100) == 95


def test_append_generated_extends_strategy():
    refs_x = [[]]
    ms = [""]
    prev = np.ones((1, 6, 2, 2, 1), np.float32)
    refs_x, ms = oc.append_generated(None, [prev[0]], refs_x, ms, 1, 2, 0.1)
    assert len(refs_x[0]) == 1
    assert ms[0] == "1,0,-2,0,2,0.1"
    refs_x, ms = oc.append_generated(None, [prev[0]], refs_x, ms, 2, 2, 0.1)
    assert ms[0] == "1,0,-2,0,2,0.1;2,1,-2,0,2,0.1"


def test_prompt_loop_split_merge_extract():
    text = "|0| a sunny day |2| a rainy day"
    segs, idxs = oc.split_prompt(text)
    assert segs == ["a sunny day", "a rainy day"] and idxs == [0, 2]
    merged = oc.merge_prompt(segs, idxs)
    assert merged == "|0|a sunny day|2|a rainy day"
    assert oc.extract_prompts_loop([merged], 0) == ["a sunny day"]
    assert oc.extract_prompts_loop([merged], 1) == ["a sunny day"]
    assert oc.extract_prompts_loop([merged], 2) == ["a rainy day"]
    # plain prompts pass through
    assert oc.split_prompt("hi") == (["hi"], None)
    assert oc.extract_prompts_loop(["hi"], 3) == ["hi"]


def test_extract_json_from_prompts():
    prompts, refs, ms = oc.extract_json_from_prompts(
        ['a cat {"reference_path": "x.npy", "mask_strategy": "0"}'],
        [""], [""])
    assert prompts == ["a cat "]
    assert refs == ["x.npy"] and ms == ["0"]
    with pytest.raises(AssertionError):
        oc.extract_json_from_prompts(['a {"bad_key": 1}'], [""], [""])


def test_append_score_to_prompts():
    out = oc.append_score_to_prompts(["a cat"], aes=6.5, flow=0.4,
                                     camera_motion="pan left")
    assert out == ["a cat aesthetic score: 6.5. motion score: 0.4. "
                   "camera motion: pan left."]
    # idempotent when markers already present
    out2 = oc.append_score_to_prompts(out, aes=9.0)
    assert out2 == out


def test_clean_caption_behavior():
    c = oc.clean_caption
    assert c("A CAT!") == "a cat!"
    assert "http" not in c("see https://example.com/x now")
    assert c("<b>bold</b> cat") == "bold cat"
    assert "@" not in c("by @someuser here")
    assert "你好" not in c("hello 你好 world")
    assert c("cat — dog") == "cat - dog"
    assert "123456789" not in c("id 123456789 end")
    # double cleaning is the training recipe
    assert oc.text_preprocessing("A CAT!") == "a cat!"
    assert oc.text_preprocessing("A CAT!", False) == "a cat!"


def test_bucket_tables():
    # the tables key on h/w ratio: "16:9" buckets are h=1280 w=720 at 720p
    assert oc.get_image_size("720p", "16:9") == (1280, 720)
    h, w = oc.get_image_size("480p", "9:16")
    assert abs(h / w - 9 / 16) < 0.05 and abs(h * w - 409920) < 40000
    assert oc.get_num_frames("2s") == 51
    assert oc.get_num_frames("4x") == 204
    assert oc.get_num_frames(64) == 64


def test_multi_resolution_info():
    info = oc.prepare_multi_resolution_info(2, (480, 848), 51, 24)
    assert info["fps"].tolist() == [24.0, 24.0]
    assert info["height"].tolist() == [480.0, 480.0]
    np.testing.assert_allclose(info["ar"], 480 / 848)
    # single-frame clips use IMG_FPS (data_process.py:799)
    info1 = oc.prepare_multi_resolution_info(1, (480, 848), 1, 24)
    assert info1["fps"][0] == oc.IMG_FPS


def test_pos_embed_multires_scale():
    """Pos-embed coords follow arange(g)/scale * base_size/g
    (OpenSoraPositionEmbedding2D + transformer :528-533)."""
    d = 16
    gh, gw = 4, 8
    scale = 1.5
    base = 6
    e = _pos_embed_2d(d, gh, gw, scale=scale, base_size=base)
    # row coordinate of entry (i, j) is i/scale * base/gh; check via the sin
    # channel at the lowest frequency
    coords_h = np.arange(gh) / scale * (base / gh)
    got = e[:, 0].reshape(gh, gw)[:, 0]          # sin(coord * omega_0)
    np.testing.assert_allclose(got, np.sin(coords_h), atol=1e-6)
    # plain path unchanged: scale 1, no base_size
    e0 = _pos_embed_2d(d, gh, gw)
    np.testing.assert_allclose(e0[:, 0].reshape(gh, gw)[:, 0],
                               np.sin(np.arange(gh)), atol=1e-6)


def test_latent_t_matches_composite_vae_round_trip():
    """lat_t follows OpenSoraVAE_V1_2.get_latent_size (per-17-frame-chunk
    ceil/4), so the pipeline's latent grid round-trips through the in-repo
    MicroFrameVAE: 51 frames -> 15 latents (NOT 51//4 = 12)."""
    from magcache_tpu.pipelines.open_sora_cond import get_latent_t

    assert get_latent_t(51) == 15
    assert get_latent_t(17) == 5
    assert get_latent_t(1) == 1
    assert get_latent_t(34) == 10
    assert get_latent_t(49) == 5 + 5 + 4   # 17+17+15
    assert get_latent_t(8) == 2


def test_read_from_path_image_and_video(tmp_path):
    """resize_crop_to_fill / read_from_path transcription
    (``data_process.py:742-788``): exact-size images pass through, the long
    axis center-crops, videos decode per-frame, all normalized to [-1, 1]."""
    from PIL import Image

    import imageio

    from magcache_tpu.pipelines.open_sora_cond import (
        read_from_path, resize_crop_to_fill)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(24, 32, 3), dtype=np.uint8)
    p = tmp_path / "ref.png"
    Image.fromarray(img).save(p)
    out = read_from_path(str(p), (24, 32))
    assert out.shape == (1, 24, 32, 3)
    np.testing.assert_allclose(out[0], img.astype(np.float32) / 127.5 - 1.0,
                               atol=1e-6)

    # wide input: height ratio wins, width center-crops (reference rounding)
    wide = np.zeros((24, 64, 3), np.uint8)
    wide[:, 28:36] = 255
    out2 = resize_crop_to_fill(Image.fromarray(wide), (24, 32))
    assert out2.shape == (24, 32, 3)
    assert out2[:, 15:17].min() == 255        # centered stripe survives

    frames = rng.integers(0, 255, size=(3, 24, 32, 3), dtype=np.uint8)
    vp = tmp_path / "ref.gif"
    imageio.mimwrite(str(vp), list(frames))
    vid = read_from_path(str(vp), (24, 32))
    assert vid.shape == (3, 24, 32, 3)        # GIF palettizes; shape/range only
    assert vid.min() >= -1.0 and vid.max() <= 1.0


def test_video_reference_conditions_via_vae(tmp_path):
    """A video file in ``refs`` encodes through the pipeline VAE and its
    first latent frame conditions generation bit-exactly (mask 0 + revert),
    mirroring ``pipeline_open_sora.py:736-751`` with a video reference."""
    import imageio

    cfg = OpenSoraPipelineConfig(tiny=True, num_frames=8, height=32, width=32,
                                 num_sampling_steps=3, caption_len=6,
                                 dtype="float32")

    class StubVAE:
        """Shape-faithful encoder: 8x spatial pool, composite-VAE temporal
        rule, 3 -> C channel tiling."""

        def __init__(self, C):
            self.C = C

        def encode(self, x):
            x = np.asarray(x, np.float32)
            B, T, H, W, _ = x.shape
            tl = oc.get_latent_t(T)
            pooled = x.reshape(B, T, H // 8, 8, W // 8, 8, 3).mean((3, 5))
            idx = np.linspace(0, T - 1, tl).astype(int)
            lat = pooled[:, idx]
            reps = -(-self.C // 3)
            return np.tile(lat, (1, 1, 1, 1, reps))[..., :self.C]

        def decode(self, z):
            return np.asarray(z)

    vae = StubVAE(CFG.in_channels)
    pipe = OpenSoraPipeline(cfg, vae=vae)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(5, 32, 32, 3), dtype=np.uint8)
    vp = tmp_path / "cond.gif"
    imageio.mimwrite(str(vp), list(frames))

    expected = vae.encode(oc.read_from_path(str(vp), (32, 32))[None])[0]
    out = pipe.generate("a boat", refs=str(vp), ms="0,0,0,0,1,0", align=1,
                        seed=0)
    lat = np.asarray(out.latents)
    np.testing.assert_array_equal(lat[0, 0], expected[0])
    assert np.isfinite(lat).all()
