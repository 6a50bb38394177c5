"""align_corners=True bilinear upsample parity vs torch.

The reference's top-down merges (FPN fpn_v2.py:155, FSSD fssd.py:118 and
our RefineDet TCB) use F.upsample(mode='bilinear') under torch 0.3.1 =
align_corners=True. upsample_bilinear must match
torch.nn.functional.interpolate(..., align_corners=True) exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from odtpu.models.fpn import upsample_bilinear, _align_corners_weights


@pytest.mark.parametrize("hin,win,hout,wout", [
    (3, 3, 5, 5),      # FPN 3x3 -> 5x5
    (5, 5, 10, 10),    # 5x5 -> 10x10
    (10, 10, 19, 19),  # 10x10 -> 19x19
    (19, 19, 38, 38),  # conv7 -> conv4_3 (FSSD fusion)
    (1, 1, 3, 3),      # coarsest level
    (4, 7, 9, 13),     # non-square, non-integer scale
    (8, 8, 5, 5),      # downsample
])
def test_matches_torch_align_corners(hin, win, hout, wout, rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.randn(2, hin, win, 3).astype(np.float32)
    got = np.asarray(upsample_bilinear(jnp.asarray(x), (hout, wout)))
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=(hout, wout), mode="bilinear",
                         align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_weights_rows_sum_to_one():
    for n_in, n_out in [(3, 5), (5, 10), (19, 38), (1, 4), (7, 3)]:
        w = np.asarray(_align_corners_weights(n_in, n_out))
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
        assert (w >= 0).all()


def test_identity_when_same_size(rng):
    x = rng.randn(1, 5, 5, 2).astype(np.float32)
    out = np.asarray(upsample_bilinear(jnp.asarray(x), (5, 5)))
    np.testing.assert_array_equal(out, x)


def test_corners_are_exact(rng):
    """align_corners pins the four corners to the input corners."""
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    out = np.asarray(upsample_bilinear(jnp.asarray(x), (13, 13)))
    np.testing.assert_allclose(out[0, 0, 0], x[0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, -1, -1], x[0, -1, -1], atol=1e-6)
    np.testing.assert_allclose(out[0, 0, -1], x[0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(out[0, -1, 0], x[0, -1, 0], atol=1e-6)
