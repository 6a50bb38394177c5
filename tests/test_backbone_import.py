"""Pretrained-backbone chain proof: torch VGG16(reduced-fc) state_dict
-> tools/convert_torch_weights.py -> load_backbone_npz -> Flax VGG16
forward parity.

This is the missing link of the mAP gate (reference bootstraps training
from vgg16_reducedfc.pth into model.base, /root/reference/train.py:75-85):
if the converted weights produce bit-equal conv4_3/conv7 features, the
accuracy story transfers. Weights are generated DETERMINISTICALLY from
numpy (not torch init) so the same arrays feed both frameworks and a
torch-free golden regression (tests/goldens/vgg16_backbone_features.npz)
stays reproducible across torch versions.
"""

import os.path as osp
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odtpu.models.vgg import TORCH_INDEX_TO_NAME, VGG16
from odtpu.utils.checkpoint import load_backbone_npz

GOLDEN = osp.join(osp.dirname(__file__), "goldens",
                  "vgg16_backbone_features.npz")

# conv name -> (in_channels, out_channels, kernel)
_CHANNELS = {
    "conv1_1": (3, 64, 3), "conv1_2": (64, 64, 3),
    "conv2_1": (64, 128, 3), "conv2_2": (128, 128, 3),
    "conv3_1": (128, 256, 3), "conv3_2": (256, 256, 3),
    "conv3_3": (256, 256, 3),
    "conv4_1": (256, 512, 3), "conv4_2": (512, 512, 3),
    "conv4_3": (512, 512, 3),
    "conv5_1": (512, 512, 3), "conv5_2": (512, 512, 3),
    "conv5_3": (512, 512, 3),
    "conv6": (512, 1024, 3), "conv7": (1024, 1024, 1),
}


def make_weights(seed=0):
    """Deterministic He-scaled OIHW kernels + biases for every VGG conv."""
    rs = np.random.RandomState(seed)
    out = {}
    for idx in sorted(TORCH_INDEX_TO_NAME):
        name = TORCH_INDEX_TO_NAME[idx]
        cin, cout, k = _CHANNELS[name]
        scale = np.sqrt(2.0 / (cin * k * k))
        out[name + ".weight"] = (
            rs.randn(cout, cin, k, k) * scale).astype(np.float32)
        out[name + ".bias"] = (rs.randn(cout) * 0.05).astype(np.float32)
    return out


def build_torch_vgg(weights):
    """torch VGG16 reduced-fc Sequential with the module indices the
    standard vgg16_reducedfc checkpoint uses (conv1_1=0 ... conv7=33;
    same arch as reference lib/models/vgg.py:16-41 / torchvision
    make_layers — rebuilt here as a test fixture, not copied)."""
    import torch
    import torch.nn as tnn

    layers = []
    for name in ["conv1_1", "conv1_2"]:
        cin, cout, k = _CHANNELS[name]
        layers += [tnn.Conv2d(cin, cout, k, padding=1), tnn.ReLU()]
    layers += [tnn.MaxPool2d(2, 2)]
    for name in ["conv2_1", "conv2_2"]:
        cin, cout, k = _CHANNELS[name]
        layers += [tnn.Conv2d(cin, cout, k, padding=1), tnn.ReLU()]
    layers += [tnn.MaxPool2d(2, 2)]
    for name in ["conv3_1", "conv3_2", "conv3_3"]:
        cin, cout, k = _CHANNELS[name]
        layers += [tnn.Conv2d(cin, cout, k, padding=1), tnn.ReLU()]
    layers += [tnn.MaxPool2d(2, 2, ceil_mode=True)]
    for name in ["conv4_1", "conv4_2", "conv4_3"]:
        cin, cout, k = _CHANNELS[name]
        layers += [tnn.Conv2d(cin, cout, k, padding=1), tnn.ReLU()]
    layers += [tnn.MaxPool2d(2, 2)]
    for name in ["conv5_1", "conv5_2", "conv5_3"]:
        cin, cout, k = _CHANNELS[name]
        layers += [tnn.Conv2d(cin, cout, k, padding=1), tnn.ReLU()]
    layers += [tnn.MaxPool2d(3, 1, padding=1),
               tnn.Conv2d(512, 1024, 3, padding=6, dilation=6), tnn.ReLU(),
               tnn.Conv2d(1024, 1024, 1), tnn.ReLU()]
    net = tnn.Sequential(*layers)
    sd = {}
    for idx, name in TORCH_INDEX_TO_NAME.items():
        sd[f"{idx}.weight"] = torch.from_numpy(weights[name + ".weight"])
        sd[f"{idx}.bias"] = torch.from_numpy(weights[name + ".bias"])
    net.load_state_dict(sd)
    net.eval()
    return net


def flax_forward(npz_path, x_nhwc):
    """Load converted weights into the SSD-shaped param tree and run the
    Flax VGG16 (f32)."""
    vgg = VGG16(dtype=jnp.float32, taps=("conv4_3", "conv7"))
    params = vgg.init(jax.random.PRNGKey(0),
                      jnp.zeros((1,) + x_nhwc.shape[1:]))["params"]
    merged, loaded, skipped = load_backbone_npz({"backbone": params},
                                                npz_path)
    assert len(loaded) == 30, loaded  # 15 convs x kernel+bias
    assert not skipped, skipped
    (c43, c7), _ = vgg.apply({"params": merged["backbone"]},
                             jnp.asarray(x_nhwc))
    return np.asarray(c43), np.asarray(c7)


def test_torch_to_flax_chain_300(tmp_path):
    """Full chain at SSD300 input size: torch forward == flax forward on
    converted weights (conv4_3 and conv7 taps, f32)."""
    torch = pytest.importorskip("torch")
    from tools.convert_torch_weights import convert_vgg

    weights = make_weights(seed=0)
    net = build_torch_vgg(weights)
    pth = str(tmp_path / "vgg16_reducedfc.pth")
    torch.save(net.state_dict(), pth)
    npz = str(tmp_path / "vgg16.npz")
    convert_vgg(pth, npz)

    rs = np.random.RandomState(1)
    x = rs.randn(1, 3, 300, 300).astype(np.float32) * 50.0
    with torch.no_grad():
        t43 = net[:23](torch.from_numpy(x)).numpy()  # ReLU after conv4_3
        t7 = net(torch.from_numpy(x)).numpy()

    f43, f7 = flax_forward(npz, x.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(f43.transpose(0, 3, 1, 2), t43,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(f7.transpose(0, 3, 1, 2), t7,
                               rtol=1e-4, atol=1e-3)


def test_backbone_golden_features(tmp_path):
    """Torch-free regression: flax forward on the deterministic weights
    reproduces the stored golden features (generated by the torch chain;
    see tools/gen_backbone_golden.py)."""
    g = np.load(GOLDEN)
    npz = str(tmp_path / "vgg16.npz")
    # convert the deterministic weights without torch: same transpose the
    # converter applies (OIHW -> HWIO)
    weights = make_weights(seed=int(g["seed"]))
    arrs = {}
    for name in _CHANNELS:
        arrs[name + "/kernel"] = weights[name + ".weight"].transpose(
            2, 3, 1, 0)
        arrs[name + "/bias"] = weights[name + ".bias"]
    np.savez(npz, **arrs)
    f43, f7 = flax_forward(npz, g["x"])
    np.testing.assert_allclose(f43, g["conv4_3"], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(f7, g["conv7"], rtol=1e-4, atol=1e-3)


def test_load_backbone_partial_fallback(tmp_path):
    """Shape-mismatched and unknown entries are skipped, matching the
    reference's partial-state-dict fallback (train.py:79-85)."""
    vgg = VGG16(dtype=jnp.float32)
    params = vgg.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)))["params"]
    npz = str(tmp_path / "bad.npz")
    np.savez(npz, **{
        "conv1_1/kernel": np.zeros((3, 3, 3, 64), np.float32),  # good
        "conv1_2/kernel": np.zeros((3, 3, 3, 3), np.float32),   # bad shape
        "not_a_layer/kernel": np.zeros((1, 1, 1, 1), np.float32),
    })
    merged, loaded, skipped = load_backbone_npz({"backbone": params}, npz)
    assert loaded == ["conv1_1/kernel"]
    assert set(skipped) == {"conv1_2/kernel", "not_a_layer/kernel"}
    got = merged["backbone"]["conv1_1"]["conv"]["kernel"]
    assert float(np.abs(got).sum()) == 0.0


def test_converter_cli_accepts_prefixed_keys(tmp_path):
    """convert_vgg handles 'base.N.weight' keys (full-model checkpoints)
    the same as bare Sequential 'N.weight' keys."""
    torch = pytest.importorskip("torch")
    from tools.convert_torch_weights import convert_vgg

    weights = make_weights(seed=3)
    sd = {}
    for idx, name in TORCH_INDEX_TO_NAME.items():
        sd[f"base.{idx}.weight"] = torch.from_numpy(
            weights[name + ".weight"])
        sd[f"base.{idx}.bias"] = torch.from_numpy(weights[name + ".bias"])
    pth = str(tmp_path / "full.pth")
    torch.save({"state_dict": sd}, pth)
    npz = str(tmp_path / "out.npz")
    convert_vgg(pth, npz)
    data = np.load(npz)
    assert len(data.files) == 30
    np.testing.assert_array_equal(
        data["conv7/kernel"],
        weights["conv7.weight"].transpose(2, 3, 1, 0))
