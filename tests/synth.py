"""Synthetic dataset generators for tests (no real VOC/COCO on disk)."""

import json
import os
import os.path as osp

import cv2
import numpy as np

from odtpu.data.voc import VOC_CLASSES


def make_voc(root, year="2007", setname="test", n_images=8, seed=0,
             min_size=200, max_size=400, num_classes=20, start_id=0):
    """Create a tiny VOCdevkit tree with random images + box annotations.
    Rectangle colors are a deterministic function of the class so the
    class signal is learnable. Returns list of (img_id, boxes_abs,
    labels)."""
    palette = np.random.RandomState(99).randint(30, 255, (20, 3))
    rng = np.random.RandomState(seed)
    base = osp.join(root, "VOC" + year)
    os.makedirs(osp.join(base, "JPEGImages"), exist_ok=True)
    os.makedirs(osp.join(base, "Annotations"), exist_ok=True)
    os.makedirs(osp.join(base, "ImageSets", "Main"), exist_ok=True)
    records = []
    ids = []
    for i in range(start_id, start_id + n_images):
        img_id = "%06d" % i
        ids.append(img_id)
        h = int(rng.randint(min_size, max_size))
        w = int(rng.randint(min_size, max_size))
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        n = rng.randint(1, 4)
        boxes, labels = [], []
        objs = []
        for _ in range(n):
            x1 = rng.randint(0, w - 40)
            y1 = rng.randint(0, h - 40)
            x2 = rng.randint(x1 + 20, min(x1 + w // 2 + 21, w))
            y2 = rng.randint(y1 + 20, min(y1 + h // 2 + 21, h))
            cls = int(rng.randint(0, num_classes))
            cv2.rectangle(img, (x1, y1), (x2, y2),
                          tuple(int(v) for v in palette[cls]), -1)
            boxes.append([x1, y1, x2, y2])
            labels.append(cls)
            objs.append(
                "<object><name>{}</name><difficult>0</difficult>"
                "<bndbox><xmin>{}</xmin><ymin>{}</ymin>"
                "<xmax>{}</xmax><ymax>{}</ymax></bndbox></object>".format(
                    VOC_CLASSES[cls], x1 + 1, y1 + 1, x2 + 1, y2 + 1))
        cv2.imwrite(osp.join(base, "JPEGImages", img_id + ".jpg"), img)
        xml = ("<annotation><filename>{}.jpg</filename>"
               "<size><width>{}</width><height>{}</height>"
               "<depth>3</depth></size>{}</annotation>").format(
                   img_id, w, h, "".join(objs))
        with open(osp.join(base, "Annotations", img_id + ".xml"), "w") as f:
            f.write(xml)
        records.append((img_id, np.asarray(boxes, np.float32),
                        np.asarray(labels)))
    with open(osp.join(base, "ImageSets", "Main", setname + ".txt"),
              "w") as f:
        f.write("\n".join(ids) + "\n")
    return records


# the standard 80 COCO category ids (1-90 with the 10 historical gaps),
# matching /root/reference/lib/datasets/coco_labels.txt's live rows
COCO80_CAT_IDS = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40,
    41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79,
    80, 81, 82, 84, 85, 86, 87, 88, 89, 90]


def make_coco_learnable(root, split="train2014", n_images=64, seed=0,
                        min_size=300, max_size=500, start_id=0):
    """Full-protocol learnable synthetic COCO: 80 real (non-contiguous)
    category ids, class-colored solid rectangles on noise (same
    learnability recipe as make_voc), full-size images. Used by the
    COCO training contract (cfgs/tests/coco_synth.yml)."""
    palette = np.random.RandomState(99).randint(30, 255, (80, 3))
    rng = np.random.RandomState(seed)
    img_dir = osp.join(root, "images", split)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(osp.join(root, "annotations"), exist_ok=True)
    images, annotations = [], []
    aid = start_id * 4 + 1
    for i in range(start_id, start_id + n_images):
        h = int(rng.randint(min_size, max_size))
        w = int(rng.randint(min_size, max_size))
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        n = rng.randint(1, 4)
        for _ in range(n):
            x1 = rng.randint(0, w - 40)
            y1 = rng.randint(0, h - 40)
            x2 = rng.randint(x1 + 20, min(x1 + w // 2 + 21, w))
            y2 = rng.randint(y1 + 20, min(y1 + h // 2 + 21, h))
            lbl = int(rng.randint(0, 80))
            cv2.rectangle(img, (x1, y1), (x2, y2),
                          tuple(int(v) for v in palette[lbl]), -1)
            annotations.append({
                "id": aid, "image_id": i + 1,
                "category_id": COCO80_CAT_IDS[lbl],
                "bbox": [float(x1), float(y1),
                         float(x2 - x1), float(y2 - y1)],
                "area": float((x2 - x1) * (y2 - y1)), "iscrowd": 0})
            aid += 1
        fname = "COCO_{}_{:012d}.jpg".format(split, i + 1)
        cv2.imwrite(osp.join(img_dir, fname), img)
        images.append({"id": i + 1, "file_name": fname,
                       "width": w, "height": h})
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": c, "name": "cat%d" % c}
                           for c in COCO80_CAT_IDS]}
    with open(osp.join(root, "annotations",
                       "instances_{}.json".format(split)), "w") as f:
        json.dump(data, f)


def make_coco(root, split="val2014", n_images=6, seed=0):
    """Create a tiny COCO tree (images/ + annotations/instances json)."""
    rng = np.random.RandomState(seed)
    img_dir = osp.join(root, "images", split)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(osp.join(root, "annotations"), exist_ok=True)
    cat_ids = [1, 3, 7, 18, 44]  # non-contiguous like real COCO
    images, annotations = [], []
    records = []
    aid = 1
    for i in range(n_images):
        h, w = int(rng.randint(200, 320)), int(rng.randint(200, 320))
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        fname = "COCO_{}_{:012d}.jpg".format(split, i + 1)
        cv2.imwrite(osp.join(img_dir, fname), img)
        images.append({"id": i + 1, "file_name": fname, "width": w,
                       "height": h})
        n = rng.randint(1, 4)
        recs = []
        for _ in range(n):
            x = float(rng.randint(0, w - 50))
            y = float(rng.randint(0, h - 50))
            bw = float(rng.randint(20, 50))
            bh = float(rng.randint(20, 50))
            cat = int(cat_ids[rng.randint(len(cat_ids))])
            annotations.append({"id": aid, "image_id": i + 1,
                                "category_id": cat,
                                "bbox": [x, y, bw, bh],
                                "area": bw * bh, "iscrowd": 0})
            recs.append((x, y, bw, bh, cat))
            aid += 1
        records.append((i + 1, recs))
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": c, "name": "cat%d" % c}
                           for c in cat_ids]}
    with open(osp.join(root, "annotations",
                       "instances_{}.json".format(split)), "w") as f:
        json.dump(data, f)
    return records
