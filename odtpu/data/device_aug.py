"""On-device photometric augmentation — jitted, batched, RNG-explicit.

The north-star design (BASELINE.json) fuses the photometric half of
SSDAugmentation onto the device so host preprocessing is never the
bottleneck: the host pipeline does the shape-changing geometry (expand /
crop / mirror / resize, cheap uint8 ops), ships a fixed-shape uint8
batch, and the device applies ConvertFromInts + PhotometricDistort +
SubtractMeans + channel flip inside the train step's jit.

Same distributions as the reference (augmentations.py:357-378):
brightness +-32 (p=.5), contrast x[.5,1.5] before OR after the HSV
block (p=.5 each side), saturation x[.5,1.5] (p=.5), hue +-18deg (p=.5),
channel permutation (p=.5). HSV conversion uses exact RGB<->HSV math on
float pixels (cv2-equivalent full-range HSV with H in degrees).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _rgb_to_hsv_planes(b: Array, g: Array, r: Array):
    """Planar BGR float planes (0-255 scale) -> (H deg, S 0-1, V 0-255).

    Planar on purpose: the batched aug runs this on [B,H,W] planes so
    every elementwise op vectorizes over the W lane dimension. The
    channels-last form ([..., 3] minor axis) puts 3 elements in a
    128-lane vector register — measured 5.8 ms/iter for the full
    distort at B=32 300x300; the planar form is the same math in the
    same op order (bit-identical) at full lane utilization."""
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-10), 0.0)
    safe = jnp.maximum(delta, 1e-10)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h * 60.0) % 360.0
    h = jnp.where(delta == 0, 0.0, h)
    return h, s, v


def _rgb_to_hsv(img: Array) -> Array:
    """[..., 3] BGR float (0-255 scale) -> HSV (H deg, S 0-1, V 0-255).
    Matches cv2.cvtColor(COLOR_BGR2HSV) float behavior."""
    h, s, v = _rgb_to_hsv_planes(img[..., 0], img[..., 1], img[..., 2])
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb_planes(h: Array, s: Array, v: Array):
    """Inverse of :func:`_rgb_to_hsv_planes`, returns (b, g, r) planes."""
    h = (h % 360.0) / 60.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return b, g, r


def _hsv_to_rgb(hsv: Array) -> Array:
    """Inverse of :func:`_rgb_to_hsv`, returns BGR float."""
    b, g, r = _hsv_to_rgb_planes(hsv[..., 0], hsv[..., 1], hsv[..., 2])
    return jnp.stack([b, g, r], axis=-1)


_PERMS = jnp.asarray([[0, 1, 2], [0, 2, 1], [1, 0, 2],
                      [1, 2, 0], [2, 0, 1], [2, 1, 0]])


def photometric_distort_device(images: Array, rng: jax.Array) -> Array:
    """Batched photometric distortion on raw BGR float images [B,H,W,3].

    Each image draws independent parameters (vmapped keys)."""
    B = images.shape[0]
    keys = jax.random.split(rng, B)

    def one(img, key):
        # planar layout throughout: every op below runs on [H, W] planes
        # (W is the vector lane axis) instead of the channels-last
        # [H, W, 3] form whose 3-wide minor axis wastes 125/128 lanes.
        # Same draws, same op order, bit-identical outputs.
        ks = jax.random.split(key, 11)
        planes = (img[..., 0], img[..., 1], img[..., 2])  # b, g, r
        # brightness
        do_b = jax.random.bernoulli(ks[0])
        delta = jax.random.uniform(ks[1], (), minval=-32.0, maxval=32.0)
        planes = tuple(jnp.where(do_b, p + delta, p) for p in planes)
        contrast_first = jax.random.bernoulli(ks[2])
        alpha1 = jax.random.uniform(ks[3], (), minval=0.5, maxval=1.5)
        do_c1 = jax.random.bernoulli(ks[4])
        planes = tuple(jnp.where(contrast_first & do_c1, p * alpha1, p)
                       for p in planes)
        h, s, v = _rgb_to_hsv_planes(*planes)
        sat = jax.random.uniform(ks[5], (), minval=0.5, maxval=1.5)
        s = s * jnp.where(jax.random.bernoulli(ks[6]), sat, 1.0)
        hue = jax.random.uniform(ks[7], (), minval=-18.0, maxval=18.0)
        h = h + jnp.where(jax.random.bernoulli(ks[8]), hue, 0.0)
        planes = _hsv_to_rgb_planes(h, s, v)
        planes = tuple(jnp.where(~contrast_first & do_c1, p * alpha1, p)
                       for p in planes)
        # lighting noise: random channel permutation. The apply gate and
        # the permutation choice draw from INDEPENDENT keys (reference
        # RandomLightingNoise, augmentations.py:125-137, draws them from
        # independent np.random calls). Plane selection by scalar
        # predicate — no channel-axis gather, no relayout.
        perm = _PERMS[jax.random.randint(ks[9], (), 0, 6)]
        do_p = jax.random.bernoulli(ks[10])
        permuted = tuple(
            jnp.where(perm[c] == 0, planes[0],
                      jnp.where(perm[c] == 1, planes[1], planes[2]))
            for c in range(3))
        planes = tuple(jnp.where(do_p, pc, p)
                       for pc, p in zip(permuted, planes))
        return jnp.stack(planes, axis=-1)

    return jax.vmap(one)(images, keys)


def preprocess_train_batch(images_u8: Array, rng: jax.Array, mean,
                           distort: bool = True) -> Array:
    """uint8 BGR [B,H,W,3] -> float32 RGB, mean-subtracted; optional
    photometric distortion. This is the device half of the train input
    pipeline (mirrors SubtractMeans + det_dataset.py:49's BGR->RGB)."""
    img = images_u8.astype(jnp.float32)
    if distort:
        img = photometric_distort_device(img, rng)
    img = img - jnp.asarray(mean, jnp.float32)
    return img[..., ::-1]
