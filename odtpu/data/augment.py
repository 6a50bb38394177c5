"""SSD train/eval image augmentation — host-side numpy/cv2 pipeline.

Parity target: /root/reference/lib/utils/augmentations.py
(SSDAugmentation:407). Same op order and probabilities:

  ConvertFromInts -> ToAbsoluteCoords -> PhotometricDistort ->
  Expand(mean fill, ratio 1-4, p=.5) -> RandomSampleCrop (6 modes incl.
  min-IoU {.1,.3,.7,.9}, 50 trials, keep boxes whose centers fall inside)
  -> RandomMirror -> ToPercentCoords -> Resize -> SubtractMeans(BGR)

Eval path = Resize + SubtractMeans only (use_base=True).

Differences by design:
- every random draw goes through an explicit np.random.Generator so
  dataloader workers are reproducible and decorrelated (the reference
  uses the global numpy RNG);
- operations return new arrays rather than mutating in place.

Kept reference quirks (documented):
- the crop retry condition `overlap.min() < min_iou and max_iou <
  overlap.max()` (augmentations.py:254) — the `and` makes the constraint
  weaker than the SSD paper's, but training parity requires it;
- crop rect uses un-rounded float w/h with int() truncation;
- hue wraps at 360 on OpenCV full-range HSV floats.
"""

from __future__ import annotations

import cv2
import numpy as np

from . import _native


def _iou_one_to_many(boxes: np.ndarray, rect: np.ndarray) -> np.ndarray:
    """IoU of [N,4] boxes against one [4] rect (jaccard_numpy parity)."""
    ix1 = np.maximum(boxes[:, 0], rect[0])
    iy1 = np.maximum(boxes[:, 1], rect[1])
    ix2 = np.minimum(boxes[:, 2], rect[2])
    iy2 = np.minimum(boxes[:, 3], rect[3])
    iw = np.clip(ix2 - ix1, 0, None)
    ih = np.clip(iy2 - iy1, 0, None)
    inter = iw * ih
    area_a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    area_b = (rect[2] - rect[0]) * (rect[3] - rect[1])
    return inter / (area_a + area_b - inter)


# --------------------------------------------------------------------------
# photometric ops (operate on float32 BGR HWC)
# --------------------------------------------------------------------------

def random_brightness(img, rng, delta=32.0):
    if rng.integers(2):
        img = img + rng.uniform(-delta, delta)
    return img


def random_contrast(img, rng, lower=0.5, upper=1.5):
    if rng.integers(2):
        img = img * rng.uniform(lower, upper)
    return img


def random_saturation(img_hsv, rng, lower=0.5, upper=1.5):
    if rng.integers(2):
        img_hsv[:, :, 1] *= rng.uniform(lower, upper)
    return img_hsv


def random_hue(img_hsv, rng, delta=18.0):
    if rng.integers(2):
        h = img_hsv[:, :, 0] + rng.uniform(-delta, delta)
        h = np.where(h > 360.0, h - 360.0, h)
        h = np.where(h < 0.0, h + 360.0, h)
        img_hsv[:, :, 0] = h
    return img_hsv


_CHANNEL_PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1),
                  (2, 1, 0))


def random_lighting_noise(img, rng):
    if rng.integers(2):
        perm = _CHANNEL_PERMS[rng.integers(len(_CHANNEL_PERMS))]
        img = img[:, :, perm]
    return img


def photometric_distort(img, rng):
    """Brightness, then contrast either before or after the HSV block,
    then channel shuffle (reference PhotometricDistort:357)."""
    img = random_brightness(img, rng)
    contrast_first = bool(rng.integers(2))
    if contrast_first:
        img = random_contrast(img, rng)
    hsv = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_BGR2HSV)
    hsv = random_saturation(hsv, rng)
    hsv = random_hue(hsv, rng)
    img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    if not contrast_first:
        img = random_contrast(img, rng)
    return random_lighting_noise(img, rng)


# --------------------------------------------------------------------------
# geometric ops (absolute pixel coords)
# --------------------------------------------------------------------------

def random_expand(img, boxes, rng, mean, max_ratio=4.0):
    if rng.integers(2):
        return img, boxes
    h, w, c = img.shape
    ratio = rng.uniform(1.0, max_ratio)
    left = int(rng.uniform(0.0, w * ratio - w))
    top = int(rng.uniform(0.0, h * ratio - h))
    canvas = np.empty((int(h * ratio), int(w * ratio), c), dtype=img.dtype)
    # uint8 canvas (device-photometric mode): round the fill rather than
    # truncate, so fractional PIXEL_MEANS (e.g. COCO-style 103.94) still
    # cancel against the on-device mean subtract to within 0.5 LSB
    canvas[:, :, :] = _expand_fill(mean, img.dtype)
    canvas[top:top + h, left:left + w] = img
    boxes = boxes.copy()
    boxes[:, 0::2] += left
    boxes[:, 1::2] += top
    return canvas, boxes


# (min_iou, max_iou) sampling modes; None = whole image
_CROP_MODES = (None, (0.1, None), (0.3, None), (0.7, None), (0.9, None),
               (None, None))


def random_sample_crop(img, boxes, labels, rng, trials=50):
    mode = _CROP_MODES[rng.integers(len(_CROP_MODES))]
    if mode is None or boxes is None or len(boxes) == 0:
        return img, boxes, labels
    min_iou = -np.inf if mode[0] is None else mode[0]
    max_iou = np.inf if mode[1] is None else mode[1]
    height, width, _ = img.shape
    for _ in range(trials):
        w = rng.uniform(0.3 * width, width)
        h = rng.uniform(0.3 * height, height)
        if h / w < 0.5 or h / w > 2:
            continue
        left = rng.uniform(0, width - w)
        top = rng.uniform(0, height - h)
        rect = np.array([int(left), int(top), int(left + w), int(top + h)])
        overlap = _iou_one_to_many(boxes, rect)
        # reference quirk: AND, not OR (augmentations.py:254)
        if overlap.min() < min_iou and max_iou < overlap.max():
            continue
        centers = (boxes[:, :2] + boxes[:, 2:]) / 2.0
        inside = ((rect[0] < centers[:, 0]) & (rect[1] < centers[:, 1]) &
                  (rect[2] > centers[:, 0]) & (rect[3] > centers[:, 1]))
        if not inside.any():
            continue
        cropped = img[rect[1]:rect[3], rect[0]:rect[2], :]
        new_boxes = boxes[inside].copy()
        new_boxes[:, :2] = np.maximum(new_boxes[:, :2], rect[:2]) - rect[:2]
        new_boxes[:, 2:] = np.minimum(new_boxes[:, 2:], rect[2:]) - rect[:2]
        return cropped, new_boxes, labels[inside]
    return img, boxes, labels


def _expand_fill(mean, dtype):
    """Expand-canvas fill value for a given image dtype (uint8 canvases
    round rather than truncate so fractional PIXEL_MEANS still cancel
    against the on-device mean subtract to within 0.5 LSB)."""
    return (np.rint(mean).astype(dtype)
            if np.issubdtype(dtype, np.integer) else mean)


def _compose_crop(img, rect, top, left, fill):
    """Pixels of the *virtual* expanded canvas (img pasted at
    (top, left) on an infinite mean-colored background) inside
    rect=(x1, y1, x2, y2) — without materializing the canvas. Only the
    strips of the window not covered by the pasted image are filled."""
    x1, y1, x2, y2 = rect
    h, w, c = img.shape
    out_h, out_w = y2 - y1, x2 - x1
    ix1, iy1 = max(x1, left), max(y1, top)
    ix2, iy2 = min(x2, left + w), min(y2, top + h)
    if ix1 >= ix2 or iy1 >= iy2:  # window misses the image entirely
        out = np.empty((out_h, out_w, c), img.dtype)
        out[:] = fill
        return out
    if (ix1, iy1, ix2, iy2) == (x1, y1, x2, y2):  # fully inside: a view
        return img[iy1 - top:iy2 - top, ix1 - left:ix2 - left]
    out = np.empty((out_h, out_w, c), img.dtype)
    oy1, oy2, ox1, ox2 = iy1 - y1, iy2 - y1, ix1 - x1, ix2 - x1
    if oy1 > 0:
        out[:oy1] = fill
    if oy2 < out_h:
        out[oy2:] = fill
    if ox1 > 0:
        out[oy1:oy2, :ox1] = fill
    if ox2 < out_w:
        out[oy1:oy2, ox2:] = fill
    out[oy1:oy2, ox1:ox2] = img[iy1 - top:iy2 - top, ix1 - left:ix2 - left]
    return out


def sample_expand_crop_geometry(shape_hw, boxes, labels, rng, max_ratio=4.0,
                                trials=50):
    """Draw the IDENTICAL RNG sequence as random_expand followed by
    random_sample_crop, but return only the geometry — no pixels are
    touched. Returns ``((top, left, rect), boxes, labels)`` where the
    result image is the window ``rect = (x1, y1, x2, y2)`` of the
    virtual canvas (the input pasted at ``(top, left)`` on an infinite
    mean-colored background) and ``boxes`` are absolute coords inside
    that window. Callers compose the pixels once, via _compose_crop or
    the native fused sampler (odtpu.data._native). The returned boxes
    never alias the input array (callers mutate them in place for the
    flip/normalize steps)."""
    h, w = shape_hw
    if boxes is not None:
        boxes = boxes.copy()
    if rng.integers(2):
        top = left = 0
        eh, ew = h, w
    else:
        ratio = rng.uniform(1.0, max_ratio)
        left = int(rng.uniform(0.0, w * ratio - w))
        top = int(rng.uniform(0.0, h * ratio - h))
        eh, ew = int(h * ratio), int(w * ratio)
        boxes[:, 0::2] += left
        boxes[:, 1::2] += top
    mode = _CROP_MODES[rng.integers(len(_CROP_MODES))]
    if mode is None or boxes is None or len(boxes) == 0:
        return (top, left, (0, 0, ew, eh)), boxes, labels
    min_iou = -np.inf if mode[0] is None else mode[0]
    max_iou = np.inf if mode[1] is None else mode[1]
    for _ in range(trials):
        cw = rng.uniform(0.3 * ew, ew)
        ch = rng.uniform(0.3 * eh, eh)
        if ch / cw < 0.5 or ch / cw > 2:
            continue
        cl = rng.uniform(0, ew - cw)
        ct = rng.uniform(0, eh - ch)
        rect = np.array([int(cl), int(ct), int(cl + cw), int(ct + ch)])
        overlap = _iou_one_to_many(boxes, rect)
        # reference quirk: AND, not OR (augmentations.py:254)
        if overlap.min() < min_iou and max_iou < overlap.max():
            continue
        centers = (boxes[:, :2] + boxes[:, 2:]) / 2.0
        inside = ((rect[0] < centers[:, 0]) & (rect[1] < centers[:, 1]) &
                  (rect[2] > centers[:, 0]) & (rect[3] > centers[:, 1]))
        if not inside.any():
            continue
        new_boxes = boxes[inside].copy()
        new_boxes[:, :2] = np.maximum(new_boxes[:, :2], rect[:2]) - rect[:2]
        new_boxes[:, 2:] = np.minimum(new_boxes[:, 2:], rect[2:]) - rect[:2]
        return (top, left, tuple(int(v) for v in rect)), new_boxes, \
            labels[inside]
    return (top, left, (0, 0, ew, eh)), boxes, labels


def random_expand_crop(img, boxes, labels, rng, mean, max_ratio=4.0,
                       trials=50):
    """Fused Expand + RandomSampleCrop: the expanded canvas stays
    virtual — the trial loop (sample_expand_crop_geometry) only needs
    box geometry, so pixels are touched once, when the accepted window
    is composed (mean-filling just its uncovered strips). Bit-identical
    outputs to the two-step path (tests/test_augment_fused.py); removes
    the dominant host cost of the pipeline (the up-to-16x-area canvas
    memset + paste of the eager expand)."""
    h, w, _ = img.shape
    geo, boxes, labels = sample_expand_crop_geometry(
        (h, w), boxes, labels, rng, max_ratio, trials)
    top, left, rect = geo
    fill = _expand_fill(mean, img.dtype)
    return _compose_crop(img, rect, top, left, fill), boxes, labels


def random_mirror(img, boxes, rng):
    if rng.integers(2):
        _, width, _ = img.shape
        img = img[:, ::-1]
        boxes = boxes.copy()
        # x1' = W - x2 ; x2' = W - x1  (reference slice trick, line 331)
        boxes[:, [0, 2]] = width - boxes[:, [2, 0]]
    return img, boxes


# --------------------------------------------------------------------------
# pipeline
# --------------------------------------------------------------------------

class SSDAugmentation:
    """Callable (img_bgr_u8, boxes_norm, labels, rng) -> (img_f32, boxes,
    labels). size is (h, w); mean is BGR. use_base=True gives the eval
    transform (resize + mean-subtract only)."""

    def __init__(self, size=(300, 300), mean=(104, 117, 123),
                 use_base: bool = False, device_photometric: bool = False,
                 device_normalize: bool = False, photometric: bool = True):
        self.size = tuple(size)
        self.mean = np.array(mean, dtype=np.float32)
        self.use_base = use_base
        # photometric=False: geometry aug only (cfg.DATASET.PHOTOMETRIC)
        self.photometric = photometric
        # device_photometric: host does only the shape-changing geometry
        # and emits uint8 BGR; the train step applies PhotometricDistort
        # + SubtractMeans + BGR->RGB on device (odtpu.data.device_aug).
        # Order deviation vs reference (distort after resize instead of
        # before expand) is documented in device_aug.py.
        self.device_photometric = device_photometric
        # device_normalize (eval path): emit resized uint8 BGR; the eval
        # step subtracts means + flips channels on device. EXACT parity:
        # the reference also resizes uint8 before the f32 subtract
        # (augmentations.py:94,61), and u8 ships 4x fewer bytes.
        self.device_normalize = device_normalize
        # step-by-step TB dumps (reference Compose tb_writer hook,
        # augmentations.py:395-404); attach_writer() arms it
        self.tb_writer = None
        self._max_dumps = 0
        self._dumps_done = 0
        import threading
        self._dump_lock = threading.Lock()

    def attach_writer(self, tb_writer, max_dumps=8):
        """Arm per-stage augmentation image dumps (one TB image per
        pipeline stage for the next `max_dumps` items). Debug aid;
        dump slots are claimed under a lock and TB writes are
        serialized, so multi-worker loaders stay at most `max_dumps`
        items with increasing step numbers."""
        self.tb_writer = tb_writer
        self._max_dumps = int(max_dumps)
        self._dumps_done = 0

    def _claim_dump_slot(self):
        """Atomically claim the next dump index, or None when spent."""
        if self.tb_writer is None:
            return None
        with self._dump_lock:
            if self._dumps_done >= self._max_dumps:
                return None
            idx = self._dumps_done
            self._dumps_done += 1
            return idx

    def _dump(self, stage, img, boxes, labels, step):
        if self.tb_writer is None:
            return
        from ..utils.visualize import vis_img_box
        u8 = np.clip(img, 0, 255).astype(np.uint8)
        gt = None
        if boxes is not None and len(boxes):
            gt = np.concatenate(
                [np.asarray(boxes, np.float32).reshape(-1, 4),
                 np.asarray(labels, np.float32).reshape(-1, 1)], axis=1)
        with self._dump_lock:
            vis_img_box(u8, {"gt": gt} if gt is not None else {},
                        self.tb_writer, tag="augmentation/" + stage,
                        step=step)

    def base(self, img):
        img = cv2.resize(img, (self.size[1], self.size[0]))
        if self.device_normalize or self.device_photometric:
            # uint8 BGR: the device half normalizes. device_photometric
            # matters here too — zero-GT train items take this early
            # path and must keep the batch's uint8 dtype (an f32 item
            # would promote the stacked batch, retrace the train step,
            # and get the mean subtracted twice)
            return np.ascontiguousarray(img)
        return img.astype(np.float32) - self.mean

    def __call__(self, img, boxes=None, labels=None, rng=None):
        if self.use_base or boxes is None or len(boxes) == 0:
            return self.base(img), boxes, labels
        rng = np.random.default_rng() if rng is None else rng
        h, w, _ = img.shape
        if self.device_photometric:
            # geometry stays uint8: expand-fill (integer pixel means),
            # crop (slicing) and mirror (flip) are exact in u8, and the
            # f32 path rounds back to u8 for device transport anyway —
            # the only delta is cv2's fixed-point u8 resize (±1 LSB on
            # interpolated pixels), accepted in this already-reordered
            # pipeline. Halves the per-item host cost (the expand
            # canvas fill and the resize dominate it).
            img = np.ascontiguousarray(img)
        else:
            img = img.astype(np.float32)
        boxes = boxes.astype(np.float32).copy()
        boxes[:, 0::2] *= w  # to absolute
        boxes[:, 1::2] *= h
        slot = self._claim_dump_slot()
        dump = slot is not None
        if dump:
            self._dump("0_input", img, boxes, labels, slot)
        if not self.device_photometric and self.photometric:
            img = photometric_distort(img, rng)
            if dump:
                self._dump("1_photometric", img, boxes, labels, slot)
        if dump:  # stepwise (eager-expand) path so every stage has pixels
            img, boxes = random_expand(img, boxes, rng, self.mean)
            self._dump("2_expand", img, boxes, labels, slot)
            img, boxes, labels = random_sample_crop(img, boxes, labels, rng)
            self._dump("3_crop", img, boxes, labels, slot)
        elif (self.device_photometric and img.dtype == np.uint8
              and _native.available):
            # fully fused native path: one C++ pass does virtual-canvas
            # compose + x-flip + cv2-bit-exact u8 INTER_LINEAR resize,
            # each output pixel reading at most 4 source taps. Identical
            # RNG draws and bit-identical pixels/boxes to the pure-python
            # path below (tests/test_native_sampler.py).
            geo, boxes, labels = sample_expand_crop_geometry(
                (h, w), boxes, labels, rng)
            top, left, rect = geo
            flip = bool(rng.integers(2))  # random_mirror's coin
            win_w = rect[2] - rect[0]
            win_h = rect[3] - rect[1]
            if flip:
                boxes[:, [0, 2]] = win_w - boxes[:, [2, 0]]
            boxes[:, 0::2] /= win_w  # to percent
            boxes[:, 1::2] /= win_h
            img = _native.fused_sample_u8(
                img, top, left, rect, flip,
                _expand_fill(self.mean, img.dtype), self.size)
            return img, boxes, labels
        else:  # fused virtual-expand path: bit-identical, same RNG draws
            img, boxes, labels = random_expand_crop(img, boxes, labels, rng,
                                                    self.mean)
        img, boxes = random_mirror(img, boxes, rng)
        if dump:
            self._dump("4_mirror", img, boxes, labels, slot)
        h, w, _ = img.shape
        boxes[:, 0::2] /= w  # to percent
        boxes[:, 1::2] /= h
        img = cv2.resize(img, (self.size[1], self.size[0]))
        if dump:
            self._dump("5_resize", img,
                       boxes * np.asarray([self.size[1], self.size[0]] * 2,
                                          np.float32), labels, slot)
        if self.device_photometric:
            if img.dtype == np.uint8:  # u8 end to end, nothing to clip
                return img, boxes, labels
            return np.clip(img, 0, 255).astype(np.uint8), boxes, labels
        return img - self.mean, boxes, labels
