"""Bottom-up (multi-person, whole-image) dataset.

No counterpart exists in the reference repo (SURVEY §6 gap: the bottom-up
HigherHRNet rows come from the paper); built from the public HigherHRNet
data recipe: whole image affine-resized to INPUT x INPUT (512 default) with
random scale/rotation/translation/flip at train time; every person's
keypoints are kept, padded to MAX_PEOPLE, with per-scale coordinates for
the 1/4 and 1/2 heads computed on device.

Supports COCO-format annotation files, which covers both COCO and OCHuman
(OCHuman ships COCO-style person_keypoints json; set
DATASET.DATASET=ochuman + ROOT accordingly).
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

from ..ops.transforms import get_affine_transform, affine_transform
from .datasets import BaseJointsDataset
from . import masks as masks_lib
from . import records as records_lib

MAX_PEOPLE = 30


class BottomUpCOCODataset(BaseJointsDataset):
    num_joints = 17
    flip_pairs = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                  [13, 14], [15, 16]]

    def __init__(self, cfg, is_train: bool, image_set: Optional[str] = None):
        super().__init__(cfg, is_train)
        self.image_set = image_set or (
            cfg.DATASET.TRAIN_SET if is_train else cfg.DATASET.TEST_SET
        )
        self.max_people = MAX_PEOPLE
        root = cfg.DATASET.ROOT
        prefix = (
            "person_keypoints" if "test" not in self.image_set else "image_info"
        )
        self.ann_file = os.path.join(
            root, "annotations", f"{prefix}_{self.image_set}.json"
        )
        image_dir = os.path.join(root, self.image_set)
        corruption = (
            cfg.TEST.CORRUPTION_TYPE
            if (cfg.TEST.TEST_ROBUST and not is_train)
            else ""
        )
        import json

        # one json.load serves both the record loader and (train only) the
        # ignore-segmentation extraction — train jsons are hundreds of MB
        with open(self.ann_file) as f:
            coco = json.load(f)
        per_person = records_lib.load_coco_gt_records(
            self.ann_file,
            image_dir,
            self.aspect_ratio,
            self.num_joints,
            max_images=200 if cfg.DATASET.MINI_COCO else None,
            corruption_type=corruption,
            severity=cfg.TEST.SEVERITY,
            root_c=cfg.DATASET.ROOT_C,
            coco=coco,
        )
        # regroup per image
        by_image: dict = {}
        for rec in per_person:
            by_image.setdefault(rec["image"], []).append(rec)
        # ignore-region segmentations (crowd / zero-keypoint / degenerate-
        # box persons) for train-time loss masking, keyed by image id
        # (public HigherHRNet mask recipe)
        ignore = (
            masks_lib.load_coco_ignore_segs(
                self.ann_file,
                max_images=200 if cfg.DATASET.MINI_COCO else None,
                coco=coco,
            )
            if is_train else {}
        )
        del coco
        self.records = []
        for path, recs in by_image.items():
            img_id = int(recs[0]["instance_index"].split("_")[0])
            info = ignore.get(img_id, {"segs": [], "hw": None})
            self.records.append(
                dict(image=path, people=recs, ignore_segs=info["segs"])
            )

    def get_sample(self, idx: int, rng: np.random.RandomState) -> dict:
        rec = self.records[idx]
        img = self._read_image(rec["image"])
        h, w = img.shape[:2]
        input_size = int(self.image_size[0])  # square input
        # VALID mask (1 = supervise): crowd / unannotated-person regions get
        # zeroed so the heatmap loss never penalizes predictions there; it
        # rides the SAME flip + affine as the image and ships at input
        # resolution (the step resizes it to each output scale on device).
        # Train-only: nothing on the eval path consumes it, so eval samples
        # skip the rasterize + warp (and the ~1 MB/sample collate weight).
        valid = (masks_lib.build_valid_mask(rec.get("ignore_segs"), h, w)
                 if self.is_train else None)

        center = np.array([w / 2.0, h / 2.0], np.float32)
        scale = np.array([max(h, w) / 200.0, max(h, w) / 200.0], np.float32)
        r = 0.0

        joints = np.zeros((self.max_people, self.num_joints, 2), np.float32)
        vis = np.zeros((self.max_people, self.num_joints), np.float32)
        people = rec["people"][: self.max_people]
        for m, p in enumerate(people):
            joints[m] = p["joints_3d"][:, :2]
            vis[m] = p["joints_3d_vis"][:, 0]

        if self.is_train:
            sf, rf = self.scale_factor, self.rotation_factor
            scale = scale * np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
            r = (
                float(np.clip(rng.randn() * rf, -rf * 2, rf * 2))
                if rng.rand() <= 0.6
                else 0.0
            )
            if self.flip and rng.rand() <= 0.5:
                img = img[:, ::-1, :]
                if valid is not None:
                    valid = valid[:, ::-1]
                joints[:, :, 0] = w - joints[:, :, 0] - 1
                for a, b in self.flip_pairs:
                    joints[:, [a, b]] = joints[:, [b, a]]
                    vis[:, [a, b]] = vis[:, [b, a]]
                center[0] = w - center[0] - 1

        trans = get_affine_transform(center, scale, r,
                                     (input_size, input_size))
        crop = cv2.warpAffine(
            img, trans, (input_size, input_size), flags=cv2.INTER_LINEAR
        )
        # out-of-canvas area warps in as 0 = ignored, matching the public
        # recipe (padding pixels carry no supervision signal)
        if valid is not None:
            mask = cv2.warpAffine(
                valid, trans, (input_size, input_size),
                flags=cv2.INTER_LINEAR,
            )
            mask = (mask > 0.5).astype(np.float32)
        else:
            mask = None
        for m in range(len(people)):
            for j in range(self.num_joints):
                if vis[m, j] > 0:
                    joints[m, j] = affine_transform(joints[m, j], trans)
                    # joints warped outside the crop become invisible
                    if not (0 <= joints[m, j][0] < input_size
                            and 0 <= joints[m, j][1] < input_size):
                        vis[m, j] = 0

        out = dict(
            image=np.ascontiguousarray(crop),
            joints=joints,
            joints_vis=vis,
            center=center,
            scale=scale,
            rotation=np.float32(r),
            score=np.float32(1.0),
            image_path=rec["image"],
            instance_index="",
        )
        if mask is not None:
            out["mask"] = mask
        return out

    def evaluate(self, cfg, preds, output_dir, all_boxes, img_path, **kwargs):
        from ..evaluation.coco_eval import evaluate_coco_keypoints

        return evaluate_coco_keypoints(
            cfg, self, preds, output_dir, all_boxes, img_path
        )
