"""Corruption dataset builder (COCO-C / MPII-C).

Behavioral reference: `tools/make_datasets.py` — for every val image, write
`<out_root>/<DATASET>-C/<corruption>/<severity 0-4>/<basename>` for all 19
corruption types at severities 1..5, seeded deterministically per render
(:38-45). The reference abuses a torch DataLoader as a process pool
(:21,53-56); here the corruptions themselves are batched jax programs
(advmix_tpu/ops/corruptions.py) running on the TPU — images are bucketed by
resolution so each bucket compiles once and streams through the chip.

Usage:
  python tools/make_datasets.py --dataset_root data/coco/val2017 \
      --out_root data --out_file coco-C [--corruptions gaussian_noise,fog]
"""

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# honor ADVMIX_PLATFORM=cpu (the session sitecustomize force-registers the
# TPU backend and overrides JAX_PLATFORMS; jax.config wins over both)
if os.environ.get("ADVMIX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["ADVMIX_PLATFORM"])


def parse():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True,
                   help="directory of source images")
    p.add_argument("--out_root", default="data")
    p.add_argument("--out_file", default="coco-C",
                   help="output dataset dir name (e.g. coco-C, mpii-C)")
    p.add_argument("--corruptions", default="",
                   help="comma-separated subset (default: all 19)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--limit", type=int, default=0,
                   help="only process the first N images (debug)")
    return p.parse_args()


def main():
    args = parse()

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp

    from advmix_tpu.ops.corruptions import ALL_CORRUPTIONS, corrupt

    names = (
        args.corruptions.split(",") if args.corruptions else ALL_CORRUPTIONS
    )

    files = sorted(
        f
        for f in os.listdir(args.dataset_root)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if args.limit:
        files = files[: args.limit]
    print(f"=> {len(files)} images, {len(names)} corruptions x 5 severities")

    # bucket by resolution so each (shape, corruption, severity) compiles once
    buckets = defaultdict(list)
    for f in files:
        img = cv2.imread(os.path.join(args.dataset_root, f), cv2.IMREAD_COLOR)
        if img is None:
            print(f"!! failed to read {f}")
            continue
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        buckets[rgb.shape].append((f, rgb))

    out_base = os.path.join(args.out_root, args.out_file)

    compiled = {}

    def apply(name, severity, batch, key):
        sig = (name, severity, batch.shape)
        if sig not in compiled:
            compiled[sig] = jax.jit(
                lambda x, k: corrupt(x, name, severity, k)
            )
        return compiled[sig](batch, key)

    for shape, items in buckets.items():
        arr = np.stack([im for _, im in items]).astype(np.float32)
        for name in names:
            for severity in range(1, 6):
                outdir = os.path.join(out_base, name, str(severity - 1))
                os.makedirs(outdir, exist_ok=True)
                for start in range(0, len(items), args.batch):
                    chunk = arr[start : start + args.batch]
                    pad = 0
                    if chunk.shape[0] < args.batch and len(items) > args.batch:
                        pad = args.batch - chunk.shape[0]
                        chunk = np.concatenate(
                            [chunk, chunk[-1:].repeat(pad, 0)], axis=0
                        )
                    # deterministic per-render seed, mirroring the
                    # np.random.seed(1) before each corrupt call (:40)
                    key = jax.random.PRNGKey(1)
                    out = np.asarray(apply(name, severity, jnp.asarray(chunk), key))
                    if pad:
                        out = out[: args.batch - pad]
                    out = np.clip(out, 0, 255).astype(np.uint8)
                    for (fname, _), im in zip(
                        items[start : start + args.batch], out
                    ):
                        cv2.imwrite(
                            os.path.join(outdir, os.path.basename(fname)),
                            cv2.cvtColor(im, cv2.COLOR_RGB2BGR),
                        )
            print(f"=> {name} done for bucket {shape}")
    print(f"=> wrote corruption dataset under {out_base}")


if __name__ == "__main__":
    main()
