"""Corruption dataset builder (COCO-C / MPII-C).

Behavioral reference: `tools/make_datasets.py` — for every val image, write
`<out_root>/<DATASET>-C/<corruption>/<severity 0-4>/<basename>` for all 19
corruption types at severities 1..5, seeded deterministically per render
(:38-45). The reference abuses a torch DataLoader as a process pool
(:21,53-56); here the corruptions themselves are batched jax programs
(advmix_tpu/ops/corruptions.py) running on the TPU.

Images are padded (edge-replicate) up to a small set of size classes —
each dimension rounds up to a multiple of --bucket_quantum — so the whole
sweep compiles O(size classes) programs per (corruption, severity) instead
of one per distinct resolution (COCO val has hundreds), and images are
decoded lazily per chunk instead of held in RAM.

Bucketing is restricted to corruptions whose output inside the original
region does not depend on the canvas: pointwise ops, iid noises
(distribution-identical under padding), and local convolutions (edge-band
deviation bounded by the kernel radius vs cv2's border mode). Corruptions
with GLOBAL spatial statistics — contrast's per-channel mean, fog/frost/
snow/spatter's canvas-sized layers, pixelate's block grid, jpeg's DCT
tiles, elastic's displacement field, zoom_blur's center — are compiled at
the EXACT source resolution (one program per distinct shape) so the
rendered -C datasets match per-image true-resolution semantics
(`/root/reference/tools/make_datasets.py:38-45`). --bucket_all restores
all-bucketed rendering for speed at documented fidelity cost.

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
    p.add_argument("--bucket_quantum", type=int, default=160,
                   help="pad each image dimension up to a multiple of this "
                        "(bounds the number of compiled programs)")
    p.add_argument("--bucket_all", action="store_true",
                   help="bucket canvas-sensitive corruptions too (faster, "
                        "deviates from per-image true-resolution rendering)")
    return p.parse_args()


# Output inside the original region depends on the padded canvas for these
# (global statistics / canvas-sized layers / size-derived grids); they run
# at exact source resolution unless --bucket_all.
CANVAS_SENSITIVE = frozenset({
    "contrast", "fog", "frost", "snow", "spatter", "elastic_transform",
    "pixelate", "jpeg_compression", "zoom_blur", "glass_blur",
})


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

    from PIL import Image

    out_base = os.path.join(args.out_root, args.out_file)
    for name in names:
        for severity in range(1, 6):
            os.makedirs(
                os.path.join(out_base, name, str(severity - 1)), exist_ok=True
            )

    compiled = {}

    def apply_all_severities(name, batch, key):
        """All 5 severities in ONE program per (corruption, shape):
        every image needs every severity anyway, so fusing them is free
        compute-wise and cuts the compile count (and the per-dispatch
        tunnel round-trips) 5x — the exact-resolution group otherwise
        compiles one program per (name, severity, resolution), which on
        COCO val's hundreds of distinct resolutions is tens of
        thousands of XLA invocations. Each severity gets the same key,
        matching the reference's np.random.seed(1) before every render
        (`tools/make_datasets.py:40`) and the previous per-severity
        loop bit-for-bit."""
        sig = (name, batch.shape)
        if sig not in compiled:
            compiled[sig] = jax.jit(
                lambda x, k: jnp.stack(
                    [corrupt(x, name, s, k, exact_render=True)
                     for s in range(1, 6)]
                )
            )
        return compiled[sig](batch, key)  # (5, B, H, W, 3)

    # Header-only reads to assign size classes (no pixel decode).
    dims = {}
    for f in files:
        try:
            with Image.open(os.path.join(args.dataset_root, f)) as im:
                dims[f] = (im.size[1], im.size[0])  # (h, w)
        except Exception:
            print(f"!! failed to read {f}")

    def run_group(group_names, quantum):
        if not group_names:
            return
        q = max(1, quantum)
        buckets = defaultdict(list)
        for f, (h, w) in dims.items():
            buckets[(-(-h // q) * q, -(-w // q) * q)].append(f)
        print(f"=> {len(group_names)} corruptions over {len(buckets)} size "
              f"classes (quantum {q})")

        # Per bucket, decode one chunk at a time and run every
        # (corruption, severity) on it before moving on — each chunk's
        # pixels are read once per group and RAM holds one padded chunk.
        for (bh, bw), items in buckets.items():
            for start in range(0, len(items), args.batch):
                chunk_files = items[start : start + args.batch]
                imgs, sizes = [], []
                for fname in chunk_files:
                    img = cv2.imread(
                        os.path.join(args.dataset_root, fname),
                        cv2.IMREAD_COLOR,
                    )
                    if img is None:
                        print(f"!! failed to read {fname}")
                        continue
                    rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                    h, w = rgb.shape[:2]
                    sizes.append((fname, h, w))
                    # edge-replicate pad up to the size class; cropped below
                    imgs.append(
                        np.pad(rgb, ((0, bh - h), (0, bw - w), (0, 0)),
                               mode="edge")
                    )
                if not imgs:
                    continue
                pad_n = (args.batch - len(imgs)
                         if len(items) > args.batch else 0)
                arr = np.stack(imgs + [imgs[-1]] * pad_n).astype(np.float32)
                for name in group_names:
                    # deterministic per-render seed, mirroring the
                    # np.random.seed(1) before each corrupt call (:40)
                    key = jax.random.PRNGKey(1)
                    out5 = np.asarray(
                        apply_all_severities(name, jnp.asarray(arr), key)
                    )
                    out5 = np.clip(out5, 0, 255).astype(np.uint8)
                    for severity in range(1, 6):
                        outdir = os.path.join(out_base, name,
                                              str(severity - 1))
                        for (fname, h, w), im in zip(sizes, out5[severity - 1]):
                            cv2.imwrite(
                                os.path.join(
                                    outdir, os.path.basename(fname)),
                                cv2.cvtColor(im[:h, :w], cv2.COLOR_RGB2BGR),
                            )
            # a (name, shape) program is never reused after its bucket:
            # drop it so exact_render constants (glass permutations, snow
            # layers, elastic fields — MBs per shape) and the finished
            # executables don't accumulate over COCO val's hundreds of
            # exact-resolution shapes
            n_dropped = 0
            for sig in [s for s in compiled if s[1][1:3] == (bh, bw)]:
                del compiled[sig]
                n_dropped += 1
            print(f"=> size class ({bh}, {bw}) done ({len(items)} images, "
                  f"{n_dropped} programs released)")

    if args.bucket_all:
        run_group(names, args.bucket_quantum)
    else:
        run_group([n for n in names if n not in CANVAS_SENSITIVE],
                  args.bucket_quantum)
        # canvas-sensitive corruptions at exact resolution (quantum 1)
        run_group([n for n in names if n in CANVAS_SENSITIVE], 1)
    print(f"=> wrote corruption dataset under {out_base}")


if __name__ == "__main__":
    main()
