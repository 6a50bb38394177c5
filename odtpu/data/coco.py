"""MS-COCO detection dataset, parsed directly from instances JSON.

Parity target: /root/reference/lib/datasets/coco.py (COCODetection:76,
COCOAnnotationTransform:36): category_id -> contiguous 0-79 labels (the
reference maps via coco_labels.txt to 1-80 then subtracts 1; sorting the
dataset's category ids gives the identical mapping), xywh -> xyxy
normalized, images without annotations dropped (coco.py:105-106),
multiple annotation sets supported (train2014 + valminusminival2014).

pycocotools is NOT required for loading (this module uses plain json);
the eval side uses it only if installed (odtpu/eval/coco_eval.py).
"""

from __future__ import annotations

import json
import os.path as osp

import cv2
import numpy as np


class COCODetection:
    """__getitem__ -> dict(image u8 BGR, boxes [N,4] normalized xyxy,
    labels [N] 0-79, extra (h,w,c), img_id (int coco id))."""

    def __init__(self, root, image_sets=(("2014", "train"),),
                 dataset_name="COCO2014", anno_file_tmpl=None,
                 image_cache=None):
        self.name = dataset_name
        self.image_cache = image_cache  # odtpu.data.cache.ImageCache
        self.root = root
        self.items = []  # (img_path, coco_img_id, [w,h], anns)
        self.cat_to_label = None
        self.label_to_cat = None
        for (year, setname) in image_sets:
            split = setname + year
            anno = (anno_file_tmpl or osp.join(
                root, "annotations", "instances_{}.json")).format(split)
            img_dir = osp.join(root, "images", split)
            if not osp.isdir(img_dir):
                img_dir = osp.join(root, split)
            self._load_split(anno, img_dir)

    def _load_split(self, anno_path, img_dir):
        with open(anno_path) as f:
            data = json.load(f)
        if self.cat_to_label is None:
            cat_ids = sorted(c["id"] for c in data["categories"])
            self.cat_to_label = {cid: i for i, cid in enumerate(cat_ids)}
            self.label_to_cat = {i: cid for cid, i in
                                 self.cat_to_label.items()}
        by_img = {}
        for a in data["annotations"]:
            if a.get("iscrowd", 0):
                pass  # reference keeps crowd boxes too (no filter)
            by_img.setdefault(a["image_id"], []).append(a)
        for im in data["images"]:
            anns = by_img.get(im["id"])
            if not anns:
                continue  # only images with annotations (reference parity)
            path = osp.join(img_dir, im["file_name"])
            self.items.append((path, im["id"],
                               (im["width"], im["height"]), anns))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        path, img_id, (w, h), anns = self.items[index]
        img = (self.image_cache.imread(path) if self.image_cache
               else cv2.imread(path))
        if img is None:
            raise IOError("failed to read " + path)
        boxes, labels = [], []
        for a in anns:
            x, y, bw, bh = a["bbox"]
            boxes.append([x / w, y / h, (x + bw) / w, (y + bh) / h])
            labels.append(self.cat_to_label[a["category_id"]])
        return {
            "image": img,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int64),
            "extra": np.asarray(img.shape, np.float32),
            "img_id": img_id,
        }
