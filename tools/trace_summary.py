"""Aggregate device self-time per op from a jax.profiler trace.

Per-op standalone re-timing is useless on the tunneled TPU backend (~22 ms
dispatch latency swamps sub-50 ms ops), so perf attribution must come from
the XLA trace itself.  This walks the TensorBoard dump written by
``jax.profiler.trace(outdir)`` (plugins/profile/*/*.trace.json.gz), keeps
only TPU-device tracks (ignoring host threads), and prints total duration
grouped by a normalized op name (fusion indices stripped), so repeated
scan iterations of the same fused op aggregate into one line.

Usage: python tools/trace_summary.py /tmp/stdit3_profile [top_n]
"""
import collections
import glob
import gzip
import json
import re
import sys


def load_events(outdir):
    paths = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {outdir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


NORM = re.compile(r"\.\d+")


def summarize(events, top_n=40):
    # pid -> process name, to keep device (TPU/XLA) tracks only.
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if ("TPU" in n or "XLA" in n or "/device:" in n)
                and "Steps" not in n}
    tot = collections.Counter()
    cnt = collections.Counter()
    wall = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = ev.get("dur", 0)
        name = NORM.sub("", ev.get("name", "?"))
        tot[name] += dur
        cnt[name] += 1
        wall += dur
    print(f"device tracks: {[pid_names[p] for p in sorted(dev_pids)]}")
    print(f"total device op-time: {wall/1e3:.2f} ms")
    print(f"{'op':60s} {'ms':>10s} {'%':>6s} {'n':>6s}")
    for name, us in tot.most_common(top_n):
        print(f"{name[:60]:60s} {us/1e3:10.3f} {100*us/wall:6.2f} {cnt[name]:6d}")
    return tot, wall


if __name__ == "__main__":
    outdir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    summarize(load_events(outdir), top_n)
