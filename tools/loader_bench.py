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


def bottomup_loader_bench(n: int = 128, batch: int = 8, threads=None,
                          input_size: int = 512):
    """Measures the REAL BottomUpCOCODataset host path at train settings
    (VERDICT r4 #9): JPEG decode + ignore-segmentation rasterization +
    flip/affine of image AND valid-mask to input_size^2 + joint warps +
    the ~1 MB/sample mask collate. Builds a synthetic COCO train tree
    (multi-person images, crowd + zero-keypoint ignore persons) so the
    mask machinery genuinely runs."""
    import json as jsonlib

    import cv2
    import numpy as np

    from advmix_tpu.config import get_default_config
    from advmix_tpu.data import Loader
    from advmix_tpu.data.bottomup import BottomUpCOCODataset

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as root:
        os.makedirs(os.path.join(root, "annotations"))
        os.makedirs(os.path.join(root, "train2017"))
        images, anns = [], []
        aid = 1
        for i in range(1, n + 1):
            h = int(rng.choice([427, 480, 640]))
            w = int(rng.choice([640, 480, 612]))
            img = rng.randint(0, 256, (h, w, 3), np.uint8)
            img = cv2.GaussianBlur(img, (0, 0), 3)
            cv2.imwrite(os.path.join(root, "train2017", "%012d.jpg" % i),
                        img, [cv2.IMWRITE_JPEG_QUALITY, 90])
            images.append(dict(id=i, width=w, height=h))
            # 2-3 annotated persons
            for _ in range(int(rng.randint(2, 4))):
                kps = []
                for _j in range(17):
                    kps += [float(rng.uniform(0, w)),
                            float(rng.uniform(0, h)), 2]
                anns.append(dict(id=aid, image_id=i, category_id=1,
                                 keypoints=kps, num_keypoints=17,
                                 bbox=[10, 10, w - 20, h - 20],
                                 area=float((w - 20) * (h - 20)),
                                 iscrowd=0))
                aid += 1
            # one crowd region with a polygon segmentation -> real
            # rasterization work per sample
            x0, y0 = rng.uniform(0, w / 2), rng.uniform(0, h / 2)
            poly = [x0, y0, x0 + w / 3, y0, x0 + w / 3, y0 + h / 3,
                    x0, y0 + h / 3]
            anns.append(dict(id=aid, image_id=i, category_id=1,
                             keypoints=[0.0] * 51, num_keypoints=0,
                             bbox=[x0, y0, w / 3, h / 3],
                             area=float(w * h / 9), iscrowd=1,
                             segmentation=[poly]))
            aid += 1
        with open(os.path.join(root, "annotations",
                               "person_keypoints_train2017.json"), "w") as f:
            jsonlib.dump(dict(images=images, annotations=anns), f)

        cfg = get_default_config()
        cfg.defrost()
        cfg.DATASET.DATASET = "bottomup_coco"
        cfg.DATASET.ROOT = root
        cfg.DATASET.TRAIN_SET = "train2017"
        cfg.MODEL.NUM_JOINTS = 17
        cfg.MODEL.IMAGE_SIZE = [input_size, input_size]
        cfg.MODEL.HEATMAP_SIZE = [input_size // 4, input_size // 4]
        cfg.freeze()

        ds = BottomUpCOCODataset(cfg, is_train=True)
        assert any(r["ignore_segs"] for r in ds.records), \
            "fixture produced no ignore regions — mask path not exercised"
        loader = Loader(ds, batch, shuffle=False, num_threads=threads)
        for _ in loader:  # warm epoch
            pass
        t0 = time.perf_counter()
        seen = 0
        for b in loader:
            assert "mask" in b, "train batches must carry the valid mask"
            seen += b["_n"]
        dt = time.perf_counter() - t0
        rate = seen / dt
        return {
            "bottomup_img_s": round(rate, 1),
            "bottomup_img_s_per_thread": round(rate / loader.num_threads, 1),
            "threads": loader.num_threads,
            "n_images": len(ds.records),
            "input_size": input_size,
        }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--threads", type=int, default=0)
    p.add_argument("--bottomup", action="store_true",
                   help="bench the 512^2 bottom-up train path (decode + "
                        "ignore-mask rasterize + warp) instead")
    args = p.parse_args(argv)
    import json

    if args.bottomup:
        res = bottomup_loader_bench(args.n, max(args.batch // 4, 1),
                                    args.threads or None)
        print(json.dumps(res))
        demand = 8 * 25.6  # measured bottom-up device step (PERF.md)
        per_core = res["bottomup_img_s_per_thread"]
        print(f"=> an 8-chip v5e host (~{demand:.0f} img/s bottom-up step "
              f"demand) needs ~{demand / max(per_core, 1e-9):.0f} cores at "
              "the measured rate")
        return

    res = loader_bench(args.n, args.batch, args.threads or None)
    print(json.dumps(res))
    demand = 8 * 500.0
    per_core = res["decode_only_img_s_per_thread"]
    print(f"=> an 8-chip v5e host (~{demand:.0f} img/s step demand) needs "
          f"~{demand / max(per_core, 1e-9):.0f} cores at the measured "
          f"decode-only rate")


if __name__ == "__main__":
    main()
