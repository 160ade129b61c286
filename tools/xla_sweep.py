"""XLA TPU flag sweep over the headline bench (VERDICT r4 #2).

PERF.md prices the 500->~515 img/s gap as scheduling fragments plus the
conv-emitter gap; this script measures whether any public XLA TPU flag
buys part of it. Each arm runs `bench.py` in a subprocess with XLA_FLAGS
set (flags change the compile-cache key, so every arm pays a fresh
compile — the measurement itself is the same two-window protocol the
headline uses). Arms whose flags the XLA client rejects are recorded as
"rejected" and cost only a fast failure.

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

# Candidate flags: public XLA TPU knobs plausibly relevant to an HBM-bound
# single-chip conv program (scoped-VMEM fusion depth, scheduler, fusion
# cost models, RNG lowering). Collective/megacore flags are omitted —
# single chip, no collectives on the headline program.
ARMS = [
    ("baseline", ""),
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_112m", "--xla_tpu_scoped_vmem_limit_kib=114688"),
    ("lhs_sched", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("rng_unsafe", "--xla_tpu_spmd_rng_bit_generator_unsafe=true"),
    ("no_rwb_fusion", "--xla_tpu_rwb_fusion=false"),
    ("bundle_cost", "--xla_tpu_use_bundle_aware_cost_model_for_fusions=true"),
    ("licm_10", "--xla_tpu_licm_size_inflation_ratio=10"),
    ("async_sched", "--xla_tpu_enable_all_experimental_scheduler_features=true"),
    ("flash_loops", "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
]


def run_arm(name, flags, steps, windows, out_fh):
    env = dict(os.environ)
    env.pop("BENCH_PREWARM_CHILD", None)
    env["BENCH_PREWARM"] = "0"  # the sweep IS the warm/compile pass
    env["BENCH_STEPS"] = str(steps)
    env["BENCH_WINDOWS"] = str(windows)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    t0 = time.time()
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=3600)
    wall = time.time() - t0
    rec = {"arm": name, "flags": flags, "wall_s": round(wall, 1)}
    if r.returncode != 0:
        err_tail = (r.stderr or r.stdout)[-800:]
        rejected = ("Unknown" in err_tail and "flag" in err_tail.lower()) or \
                   ("Illegal" in err_tail) or ("unrecognized" in err_tail.lower())
        rec["status"] = "rejected" if rejected else "failed"
        rec["err"] = err_tail[-300:]
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
    ap.add_argument("--arms", default="")
    args = ap.parse_args()

    arms = ARMS
    if args.arms:
        want = set(args.arms.split(","))
        arms = [a for a in ARMS if a[0] in want]
        # allow ad-hoc "name=flags" arms for combo runs
        for spec in args.arms.split(","):
            if "=" in spec and not any(a[0] == spec for a in ARMS):
                pass

    results = []
    with open(args.out, "a") as fh:
        for name, flags in arms:
            try:
                results.append(run_arm(name, flags, args.steps,
                                       args.windows, fh))
            except subprocess.TimeoutExpired:
                fh.write(json.dumps({"arm": name, "status": "timeout"}) + "\n")
                fh.flush()

    base = next((r for r in results
                 if r["arm"] == "baseline" and r["status"] == "ok"), None)
    print("\n| arm | flags | img/s/chip | delta vs baseline |")
    print("|---|---|---|---|")
    for r in results:
        if r["status"] != "ok":
            print(f"| {r['arm']} | `{r['flags']}` | {r['status']} | — |")
            continue
        d = ""
        if base:
            d = f"{r['img_s_chip'] - base['img_s_chip']:+.1f}"
        print(f"| {r['arm']} | `{r['flags']}` | {r['img_s_chip']} | {d} |")


if __name__ == "__main__":
    main()
