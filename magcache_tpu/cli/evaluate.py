"""Quality-gate CLI: compare cached runs against full-compute goldens.

Mirrors the reference's eval entry points
(``eval/magcache/common_metrics/eval.py:76-150`` single-pair flow and
``batch_eval.py`` directory walker):

  # pairwise directories of .npy videos
  python -m magcache_tpu.cli.evaluate --cached out/magcache --golden out/full \
      --lpips_weights /path/to/lpips_alex.pth --report report.txt

  # end-to-end tiny self-consistency run (full vs magcache, same seed)
  python -m magcache_tpu.cli.evaluate --self_check --json EVAL.json
"""

from __future__ import annotations

import argparse
import json
import time


def build_parser():
    p = argparse.ArgumentParser("magcache-tpu evaluate")
    p.add_argument("--cached", help="dir of cached-run .npy videos")
    p.add_argument("--golden", help="dir of full-compute .npy videos")
    p.add_argument("--lpips_weights",
                   help="torch lpips.LPIPS(net='alex') checkpoint; without it "
                        "LPIPS is skipped (random backbone cannot gate quality)")
    p.add_argument("--metrics", default="psnr,ssim,lpips")
    p.add_argument("--report", help="write a text report here")
    p.add_argument("--json", help="write the aggregate JSON here")
    p.add_argument("--self_check", action="store_true",
                   help="tiny-model full-vs-magcache self-consistency run")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cpu", action="store_true")
    return p


def _self_check(args) -> dict:
    """Full-compute vs MagCache on the tiny Wan model, same seed — the
    structural analogue of the reference's golden comparison
    (``common_metrics/eval.py:76-150``) runnable without checkpoints."""
    import numpy as np

    from magcache_tpu.eval.compare import compare_videos
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    outs = {}
    times = {}
    params = None
    for variant in ("full", "magcache", "teacache"):
        cfg = WanPipelineConfig(
            task="t2v", tiny=True, size=(64, 64), frame_num=9,
            sample_steps=args.steps, sample_solver="unipc", dtype="float32",
            use_magcache=(variant == "magcache"),
            enable_teacache=(variant == "teacache"))
        pipe = WanPipeline(cfg, params=params)
        params = pipe.params                      # share weights across runs
        t0 = time.time()
        out = pipe.generate("a calico cat on a windowsill", seed=args.seed)
        times[variant] = time.time() - t0
        lat = np.asarray(out.latents)[0]          # [T, H, W, C]
        lo, hi = lat.min(), lat.max()
        outs[variant] = ((lat[..., :3] - lo) / max(hi - lo, 1e-8)).astype(np.float32)

    return {
        "mode": "tiny-self-consistency (random init; structural gate only)",
        "steps": args.steps,
        "seed": args.seed,
        "metrics_magcache_vs_full": compare_videos(
            outs["magcache"], outs["full"], metrics=("psnr", "ssim")),
        "metrics_teacache_vs_full": compare_videos(
            outs["teacache"], outs["full"], metrics=("psnr", "ssim")),
        "seconds": times,
    }


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.lpips_weights:
        from magcache_tpu.eval.metrics import load_lpips_weights
        load_lpips_weights(args.lpips_weights)

    if args.self_check:
        result = _self_check(args)
    else:
        assert args.cached and args.golden, "--cached and --golden required"
        from magcache_tpu.eval.compare import compare_dirs, write_report
        metrics = [m for m in args.metrics.split(",") if m]
        if "lpips" in metrics and not args.lpips_weights:
            print("note: dropping lpips (no --lpips_weights; random backbone "
                  "cannot gate quality)")
            metrics = [m for m in metrics if m != "lpips"]
        result = compare_dirs(args.cached, args.golden, metrics=metrics)
        if args.report:
            write_report(result, args.report)

    print(json.dumps(result if "per_video" not in result
                     else result["mean"], indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
