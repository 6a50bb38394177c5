"""Device-side photometric augmentation tests: HSV round trip vs cv2,
distribution sanity, jit/batch behavior."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from odtpu.data.device_aug import (_hsv_to_rgb, _rgb_to_hsv,
                                   photometric_distort_device,
                                   preprocess_train_batch)


def test_hsv_roundtrip(rng):
    img = rng.randint(0, 255, (16, 16, 3)).astype(np.float32)
    back = np.asarray(_hsv_to_rgb(_rgb_to_hsv(jnp.asarray(img))))
    np.testing.assert_allclose(back, img, atol=1e-2)


def test_hsv_matches_cv2(rng):
    img = rng.randint(0, 255, (8, 8, 3)).astype(np.float32)
    ours = np.asarray(_rgb_to_hsv(jnp.asarray(img)))
    want = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    np.testing.assert_allclose(ours[..., 0], want[..., 0], atol=0.5)
    np.testing.assert_allclose(ours[..., 1], want[..., 1], atol=1e-3)
    np.testing.assert_allclose(ours[..., 2], want[..., 2], atol=1e-3)


def test_distort_deterministic_per_key(rng):
    imgs = jnp.asarray(rng.randint(0, 255, (4, 16, 16, 3))
                       .astype(np.float32))
    a = photometric_distort_device(imgs, jax.random.PRNGKey(1))
    b = photometric_distort_device(imgs, jax.random.PRNGKey(1))
    c = photometric_distort_device(imgs, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).max()) > 0


def test_distort_per_image_independent(rng):
    """Two identical images in one batch get different distortions."""
    img = rng.randint(0, 255, (1, 16, 16, 3)).astype(np.float32)
    batch = jnp.asarray(np.repeat(img, 8, axis=0))
    out = np.asarray(photometric_distort_device(batch,
                                                jax.random.PRNGKey(0)))
    diffs = [np.abs(out[i] - out[0]).max() for i in range(1, 8)]
    assert max(diffs) > 0


def test_preprocess_train_batch_no_distort(rng):
    """distort=False reduces to SubtractMeans + BGR->RGB exactly."""
    u8 = rng.randint(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    mean = (104, 117, 123)
    out = np.asarray(preprocess_train_batch(jnp.asarray(u8),
                                            jax.random.PRNGKey(0), mean,
                                            distort=False))
    want = (u8.astype(np.float32) - np.asarray(mean, np.float32))[..., ::-1]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_distort_distribution_matches_host(rng):
    """The device photometric path and the host pipeline (augment.py
    photometric_distort — reference semantics) must produce the SAME
    output distribution over many independent draws: equal per-channel
    means/stds and an equal channel-permutation rate. Guards against RNG
    correlation bugs (e.g. one key gating AND selecting the channel
    permutation skews the perm distribution)."""
    from odtpu.data.augment import photometric_distort

    N = 1024
    img = rng.integers(0, 255, (12, 12, 3)).astype(np.float32) \
        if hasattr(rng, "integers") else \
        rng.randint(0, 255, (12, 12, 3)).astype(np.float32)

    host_rng = np.random.default_rng(7)
    host_out = np.stack([photometric_distort(img.copy(), host_rng)
                         for _ in range(N)])

    batch = jnp.asarray(np.broadcast_to(img, (N,) + img.shape))
    dev_out = np.asarray(photometric_distort_device(
        batch, jax.random.PRNGKey(3)))

    # per-channel first/second moments across draws
    hm = host_out.mean(axis=(0, 1, 2))
    dm = dev_out.mean(axis=(0, 1, 2))
    np.testing.assert_allclose(hm, dm, rtol=0.06)
    hs = host_out.std(axis=(0, 1, 2))
    ds = dev_out.std(axis=(0, 1, 2))
    np.testing.assert_allclose(hs, ds, rtol=0.10)

    # channel-permutation rate: p(apply)=.5 times 5/6 non-identity perms
    # = 5/12 of draws should have channels visibly swapped. Detect a swap
    # via the per-draw channel-mean ordering changing vs the source.
    def swap_rate(out):
        ch = out.mean(axis=(1, 2))  # [N, 3]
        order = np.argsort(ch, axis=1)
        src_order = np.argsort(img.mean(axis=(0, 1)))
        return float((order != src_order).any(axis=1).mean())

    hr, dr = swap_rate(host_out), swap_rate(dev_out)
    assert abs(hr - dr) < 0.06, (hr, dr)


def test_distort_jits(rng):
    f = jax.jit(photometric_distort_device)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 8, 8, 3)).astype(np.float32))
    out = f(imgs, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
