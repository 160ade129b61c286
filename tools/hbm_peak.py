"""Measured-peak HBM bandwidth microbenchmark (VERDICT r2 #2a).

Runs known-traffic streaming kernels — scale (y = a*x + b: read nbytes,
write nbytes) and triad (y = a*x + z: 2 reads, 1 write) — as SEPARATE
dispatches (a chained scan would let XLA fuse the whole chain into one
kernel and collapse the traffic), captures a jax.profiler trace, and sums
the device-event time of the fusion kernels. Host wall-clock is NOT used:
under the axon tunnel dispatch is asynchronous and block_until_ready
returns before device completion (see CLAUDE.md / PERF.md).

The resulting number is the *measured achievable* bandwidth this chip
sustains on pure streaming traffic; PERF.md's roofline tables normalize
against it rather than the ~819 GB/s spec sheet.

Usage:  python tools/hbm_peak.py [--mb 512] [--iters 20]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

if os.environ.get("ADVMIX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["ADVMIX_PLATFORM"])


def device_time_us(trace_dir: str) -> float:
    """Sum device-event durations (us) of compute kernels in the newest
    trace (copy/infeed/outfeed excluded). Trace loading is shared with
    tools/profile.py (_load_trace) so the gzip/schema handling lives in
    one place."""
    # pin tools/ ahead of stdlib's `profile` module for this import
    tools_dir = os.path.dirname(os.path.abspath(__file__))
    if sys.path[0] != tools_dir:
        sys.path.insert(0, tools_dir)
    from profile import _load_trace

    total = 0.0
    for e in _load_trace(trace_dir)["traceEvents"]:
        if e.get("ph") != "X":
            continue
        c = e.get("args", {}).get("hlo_category")
        if c is None or c == "while":
            continue
        if "copy" in c or "infeed" in c or "outfeed" in c:
            continue
        total += e["dur"]
    return total


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace_dir", type=str, default="/tmp/hbm_trace")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    n = args.mb * 1024 * 1024 // 4  # f32 elements
    iters = args.iters
    dev = jax.devices()[0]
    print(f"=> device: {dev.device_kind}, buffer {args.mb} MiB, "
          f"{iters} dispatches per kernel")

    x = jnp.full((n,), 1.0, jnp.float32)
    z = jnp.full((n,), 0.5, jnp.float32)

    scale = jax.jit(lambda x: x * 1.0000001 + 1.0)
    triad = jax.jit(lambda x, z: x * 1.0000001 + z)

    results = {}
    for name, fn, fnargs, bytes_per in (
        ("scale", scale, (x,), 2 * n * 4),
        ("triad", triad, (x, z), 3 * n * 4),
    ):
        fn(*fnargs).block_until_ready()  # compile
        tdir = os.path.join(args.trace_dir, name)
        with jax.profiler.trace(tdir):
            out = fnargs[0]
            for _ in range(iters):
                out = fn(*((out,) + fnargs[1:]))
            out.block_until_ready()
            jax.device_get(out.ravel()[:1])
        us = device_time_us(tdir)
        gb = bytes_per * iters / 1e9
        gbs = gb / (us / 1e6)
        print(f"{name:8s} {gb:8.2f} GB in {us / 1e3:8.2f} ms device time "
              f"-> {gbs:7.1f} GB/s")
        results[name] = gbs

    peak = max(results.values())
    print(f"=> measured achievable HBM bandwidth: {peak:.0f} GB/s")
    print(json.dumps(
        {"device": dev.device_kind, "measured_peak_gbs": round(peak, 1),
         **{k: round(v, 1) for k, v in results.items()}}
    ))
    return results


if __name__ == "__main__":
    main()
