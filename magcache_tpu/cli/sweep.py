"""Sweep CLI: the wan_eval.sh equivalent.

  # full-compute goldens for prompts [0, 100)
  python -m magcache_tpu.cli.sweep --variant full --end_index 100 \
      --out_dir out/full --ckpt_dir ...

  # magcache run of the same slice, then compare
  python -m magcache_tpu.cli.sweep --variant magcache --end_index 100 \
      --out_dir out/magcache --compare_to out/full
"""

from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser("magcache-tpu sweep")
    p.add_argument("--variant", default="magcache",
                   choices=["full", "magcache", "teacache", "rolling"])
    p.add_argument("--teacache_thresh", type=float, default=0.2)
    p.add_argument("--use_ret_steps", action="store_true")
    p.add_argument("--prompts", default=None,
                   help="txt file (one prompt/line) or a VBench JSON list with prompt_en fields")
    p.add_argument("--loop", type=int, default=1,
                   help="videos per prompt; the VBench protocol uses 5 with seed=loop index (experiments/utils.py:9-14)")
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=None)
    p.add_argument("--out_dir", default="sweep_out")
    p.add_argument("--base_seed", type=int, default=0)
    p.add_argument("--model", default="wan2.1-t2v-1.3B")
    p.add_argument("--size", default="832*480")
    p.add_argument("--frame_num", type=int, default=81)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--sample_solver", default="unipc")
    p.add_argument("--magcache_thresh", type=float, default=None)
    p.add_argument("--magcache_K", type=int, default=None)
    p.add_argument("--retention_ratio", type=float, default=None)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--compare_to", default=None,
                   help="golden dir: run PSNR/SSIM against it after the sweep")
    p.add_argument("--lpips_weights", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from magcache_tpu.eval.sweep import SweepConfig, run_sweep

    w, h = (int(v) for v in args.size.split("*"))
    cfg = SweepConfig(
        variant=args.variant, prompts_file=args.prompts,
        start_index=args.start_index, end_index=args.end_index,
        out_dir=args.out_dir, base_seed=args.base_seed, model=args.model,
        size=(w, h), frame_num=args.frame_num, sample_steps=args.sample_steps,
        sample_solver=args.sample_solver, magcache_thresh=args.magcache_thresh,
        magcache_K=args.magcache_K, retention_ratio=args.retention_ratio,
        teacache_thresh=args.teacache_thresh, use_ret_steps=args.use_ret_steps,
        dp=args.dp, sp=args.sp, tp=args.tp, dtype=args.dtype,
        ckpt_dir=args.ckpt_dir, tiny=args.tiny, loop=args.loop)
    summary = run_sweep(cfg)

    if args.compare_to:
        from magcache_tpu.eval.compare import compare_dirs, write_report
        metrics = ["psnr", "ssim"]
        if args.lpips_weights:
            from magcache_tpu.eval.metrics import load_lpips_weights
            load_lpips_weights(args.lpips_weights)
            metrics.append("lpips")
        cmp = compare_dirs(args.out_dir, args.compare_to, metrics=metrics)
        summary["vs_golden"] = cmp["mean"]
        write_report(cmp, f"{args.out_dir}/report.txt")
    print(json.dumps(summary, indent=1))
    return summary


if __name__ == "__main__":
    main()
