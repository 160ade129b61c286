"""XLA TPU compiler-option sweep over the headline bench (VERDICT r4 #2).

PERF.md prices the 500->~515 img/s gap as scheduling fragments plus the
conv-emitter gap; this script measures whether any public XLA TPU knob
buys part of it.

Transport matters here: the TPU compile happens REMOTELY behind the axon
relay, and the LOCAL XLA_FLAGS parser fatals ("Unknown flag in
XLA_FLAGS") on any xla_tpu_* flag — measured, every env-flag arm of the
first sweep attempt died in parse_flags_from_env.cc. TPU options must
instead ride the compile request via jit .lower().compile(
compiler_options=...), which the remote compile helper validates (a
bogus option name is rejected with HTTP 500). bench.py exposes that path
as BENCH_XLA_OPTS="key=value ...", which this sweep drives.

Each arm pays a fresh remote compile (options key the compile cache) +
the same two-window measurement protocol as the headline. Arms the
remote compiler rejects are recorded as "rejected" and cost only a fast
failure.

Usage:
  python tools/xla_sweep.py [--out /tmp/xla_sweep.jsonl] [--steps 20]
                            [--arms name1,name2,...]   # subset
Writes one JSON line per arm and prints a final markdown table for
PERF.md.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Candidate options: public XLA TPU knobs plausibly relevant to an
# HBM-bound single-chip conv program (scoped-VMEM fusion depth, latency
# scheduler, fusion cost models, loop-invariant code motion). Collective/
# megacore knobs are omitted — single chip, no collectives on the
# headline program.
ARMS = [
    ("baseline", ""),
    ("vmem_64m", "xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_112m", "xla_tpu_scoped_vmem_limit_kib=114688"),
    ("lhs_sched", "xla_tpu_enable_latency_hiding_scheduler=true"),
    ("no_rwb_fusion", "xla_tpu_rwb_fusion=false"),
    ("licm_10", "xla_tpu_licm_size_inflation_ratio=10"),
    ("bundle_cost", "xla_tpu_use_bundle_aware_cost_model_for_fusions=true"),
    ("aggressive_loop_fusion",
     "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
    ("vector_load_fusion", "xla_tpu_vector_load_fusion_window=2048"),
    ("dot_dot_fusion", "xla_tpu_enable_dot_dot_fusion=true"),
]


def run_arm(name, opts, steps, windows, out_fh):
    env = dict(os.environ)
    env.pop("BENCH_PREWARM_CHILD", None)
    env["BENCH_PREWARM"] = "0"  # the sweep IS the warm/compile pass
    env["BENCH_STEPS"] = str(steps)
    env["BENCH_WINDOWS"] = str(windows)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    env["BENCH_XLA_OPTS"] = opts
    t0 = time.time()
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=3600)
    wall = time.time() - t0
    rec = {"arm": name, "opts": opts, "wall_s": round(wall, 1)}
    if r.returncode != 0:
        err_tail = (r.stderr or r.stdout)[-1200:]
        rejected = any(s in err_tail for s in (
            "Unknown flag", "No such flag", "unknown option",
            "No such compile option",
            "tpu_compile_helper subprocess exit code",
        ))
        rec["status"] = "rejected" if rejected else "failed"
        rec["err"] = err_tail[-400:]
    else:
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        out = json.loads(line)
        rec["status"] = "ok"
        rec["img_s_chip"] = out["value"]
        rec["windows"] = out.get("window_img_s_chip")
        if out.get("degraded"):
            rec["degraded"] = True
    out_fh.write(json.dumps(rec) + "\n")
    out_fh.flush()
    print(f"[xla_sweep] {name}: {rec.get('img_s_chip', rec['status'])} "
          f"({wall:.0f}s)", file=sys.stderr)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/xla_sweep.jsonl")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--arms", default="",
                    help="comma-separated subset of arm names; a spec "
                         "'name=key=value' adds an ad-hoc arm")
    args = ap.parse_args()

    arms = ARMS
    if args.arms:
        specs = args.arms.split(",")
        want = set(s for s in specs if "=" not in s)
        arms = [a for a in ARMS if a[0] in want]
        for spec in specs:
            if "=" in spec:
                n, _, o = spec.partition("=")
                arms.append((n, o))

    results = []
    with open(args.out, "a") as fh:
        for name, opts in arms:
            try:
                results.append(run_arm(name, opts, args.steps,
                                       args.windows, fh))
            except subprocess.TimeoutExpired:
                fh.write(json.dumps({"arm": name, "status": "timeout"}) + "\n")
                fh.flush()

    base = next((r for r in results
                 if r["arm"] == "baseline" and r["status"] == "ok"), None)
    print("\n| arm | compiler options | img/s/chip | delta vs baseline |")
    print("|---|---|---|---|")
    for r in results:
        if r["status"] != "ok":
            print(f"| {r['arm']} | `{r['opts']}` | {r['status']} | — |")
            continue
        d = ""
        if base:
            d = f"{r['img_s_chip'] - base['img_s_chip']:+.1f}"
        print(f"| {r['arm']} | `{r['opts']}` | {r['img_s_chip']} | {d} |")


if __name__ == "__main__":
    main()
