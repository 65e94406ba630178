"""CI drive of the first-contact kit (tools/validate_checkpoints.py): builds
reference-named synthetic checkpoints on disk and runs the full walk ->
detect -> sniff -> convert -> shape-match -> forward pipeline, so weights-day
against real files is a checklist (the tool's real invocation is documented
in its module docstring)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "validate_checkpoints",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "validate_checkpoints.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _save(tmp_path, name, sd):
    from safetensors.numpy import save_file
    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    save_file({k: np.asarray(v) for k, v in sd.items()},
              str(d / "diffusion_pytorch_model.safetensors"))
    return str(d)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ckpts")
    rng = np.random.default_rng(0)

    from tests.test_convert import _flux_tiny_sd, _wan_tiny_sd, make_omnigen2_sd
    from magcache_tpu.models.flux import FluxConfig
    from magcache_tpu.models.omnigen2 import OmniGen2Config
    from magcache_tpu.models.wan import WanConfig

    _save(tmp_path, "Wan2.1-T2V-tiny",
          _wan_tiny_sd(WanConfig.tiny(), rng))
    _save(tmp_path, "FLUX.1-tiny",
          _flux_tiny_sd(FluxConfig.tiny(mlp_ratio=4), rng))
    _save(tmp_path, "OmniGen2-tiny",
          make_omnigen2_sd(OmniGen2Config.tiny()))

    from tests.test_ckpt_plumbing import _write_latte_ckpt
    from magcache_tpu.models.latte import LatteConfig
    latte_dir = tmp_path / "Latte-tiny"
    latte_dir.mkdir()
    _write_latte_ckpt(latte_dir, LatteConfig.tiny())

    # an unrecognized weights dir must be reported, not crash the walk
    _save(tmp_path, "mystery", {"foo.weight": np.zeros((2, 2), np.float32)})
    return tmp_path


def test_walk_detect_convert_forward(tree):
    mod = _tool()
    dirs = mod.find_weight_dirs(str(tree))
    assert len(dirs) == 5
    recs = {os.path.basename(d): mod.validate_dir(d, forward=True)
            for d in dirs}

    by_fam = {r.get("family"): r for r in recs.values()}
    for fam in ("wan-dit", "flux-dit", "omnigen2", "latte"):
        assert fam in by_fam, (fam, {k: r.get("status") for k, r in recs.items()})
        r = by_fam[fam]
        assert r["status"] == "ok", r
        assert r["shape_match"], r
        assert r.get("forward") == "ok", r
        assert r["params_m"] > 0
    assert recs["mystery"]["status"] == "unrecognized"


def test_report_and_exit_code(tree, tmp_path, capsys):
    mod = _tool()
    rep = tmp_path / "report.json"
    rc = mod.main([str(tree), "--report", str(rep), "--cpu"])
    assert rc == 1                        # the mystery dir fails the run
    data = json.loads(rep.read_text())
    assert data["ok"] == 4 and data["total"] == 5
    out = capsys.readouterr().out
    assert "4/5 components validated" in out


def test_sniffed_configs_match_published_geometry(tree):
    """Sniffers recover the structural fields the converters need."""
    mod = _tool()
    from magcache_tpu.models.wan import WanConfig
    from magcache_tpu.models.convert import load_safetensors_dir
    cfg_t = WanConfig.tiny()
    sd = load_safetensors_dir(str(tree / "Wan2.1-T2V-tiny"))
    cfg = mod.sniff_wan(sd)
    assert (cfg.dim, cfg.layers, cfg.ffn_dim, cfg.text_dim) == \
           (cfg_t.dim, cfg_t.layers, cfg_t.ffn_dim, cfg_t.text_dim)
    assert cfg.model_type == "t2v"


def test_serve_smoke_roundtrip(tree):
    """--serve: converted Wan weights -> pipeline -> HTTP /generate -> 200
    (the weights-day full user surface, VERDICT r4 item 9)."""
    mod = _tool()
    rec = mod.serve_smoke(mod.find_weight_dirs(str(tree)))
    assert rec["status"] == "done", rec
    assert rec["latents_shape"], rec
