"""Host input-pipeline throughput benchmark (VERDICT r2 weak #4/#7).

Writes COCO-val-sized synthetic JPEGs to a temp dir, then measures the
REAL Loader (thread pool, prefetch, collate) sustaining rate in both host
modes:

- default path: JPEG decode + per-sample cv2.warpAffine crop
  (`BaseJointsDataset.get_sample` — the reference's hot loop,
  `lib/dataset/JointsDataset.py:135-195`)
- DEVICE_WARP path: JPEG decode only; the crop warp runs batched on the
  TPU (`get_raw_sample`)

Reports img/s and img/s/thread so a target host's rate is
thread-count-proportional: an 8-chip v5e host needs
8 x ~500 img/s of step demand; at the measured per-core rate that is
covered by `demand / rate_per_core` cores.

Usage:  python tools/loader_bench.py [--n 256] [--batch 32] [--threads N]
Also callable via loader_bench() for bench.py's extras.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_jpegs(root: str, n: int, seed: int = 0):
    import cv2
    import numpy as np

    rng = np.random.RandomState(seed)
    paths = []
    for i in range(n):
        h = int(rng.choice([427, 480, 640]))
        w = int(rng.choice([640, 480, 612]))
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        # JPEG-compressible content (pure noise decodes unusually slowly)
        img = cv2.GaussianBlur(img, (0, 0), 3)
        p = os.path.join(root, f"{i:06d}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)
    return paths


def loader_bench(n: int = 256, batch: int = 32, threads=None,
                 image_size=(192, 256)):
    """Returns {'decode_warp_img_s', 'decode_only_img_s', 'threads', ...}."""
    import numpy as np

    from advmix_tpu.config import get_default_config
    from advmix_tpu.data import Loader
    from advmix_tpu.data.datasets import SyntheticPoseDataset

    cfg = get_default_config()
    cfg.defrost()
    cfg.MODEL.IMAGE_SIZE = list(image_size)
    cfg.MODEL.HEATMAP_SIZE = [image_size[0] // 4, image_size[1] // 4]
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.DATASET = "synthetic"
    cfg.freeze()

    with tempfile.TemporaryDirectory() as root:
        paths = _make_jpegs(root, n)

        class JpegDataset(SyntheticPoseDataset):
            """Synthetic records whose pixels come from real JPEG files,
            so the bench exercises the actual decode path."""

            def __init__(self):
                super().__init__(cfg, is_train=True, length=n)
                for rec, p in zip(self.records, paths):
                    rec["image"] = p
                    # center/scale covering a person-sized crop
                    rec["center"] = np.array([320.0, 240.0], np.float32)
                    rec["scale"] = np.array([1.2, 1.6], np.float32)

            def _read_image(self, path):
                import cv2

                img = cv2.imread(path, cv2.IMREAD_COLOR)
                return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

        ds = JpegDataset()
        out = {}
        for name, kw in (
            ("decode_warp", {}),
            ("decode_only", {"raw_mode": True, "bucket_hw": (640, 640)}),
        ):
            loader = Loader(ds, batch, shuffle=False, num_threads=threads,
                            **kw)
            # warm one epoch (page cache, thread pool startup)
            for _ in loader:
                pass
            t0 = time.perf_counter()
            seen = 0
            for b in loader:
                seen += b["_n"]
            dt = time.perf_counter() - t0
            out[f"{name}_img_s"] = round(seen / dt, 1)
        out["threads"] = loader.num_threads
        out["n_images"] = n
        for name in ("decode_warp", "decode_only"):
            out[f"{name}_img_s_per_thread"] = round(
                out[f"{name}_img_s"] / out["threads"], 1
            )
        return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--threads", type=int, default=0)
    args = p.parse_args(argv)
    import json

    res = loader_bench(args.n, args.batch, args.threads or None)
    print(json.dumps(res))
    demand = 8 * 500.0
    per_core = res["decode_only_img_s_per_thread"]
    print(f"=> an 8-chip v5e host (~{demand:.0f} img/s step demand) needs "
          f"~{demand / max(per_core, 1e-9):.0f} cores at the measured "
          f"decode-only rate")


if __name__ == "__main__":
    main()
