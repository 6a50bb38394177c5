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


def test_distort_jits(rng):
    f = jax.jit(photometric_distort_device)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 8, 8, 3)).astype(np.float32))
    out = f(imgs, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
