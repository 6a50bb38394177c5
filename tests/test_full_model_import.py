"""Full reference-checkpoint import chain: a complete SSD300 torch
state dict (base + L2Norm + extras + loc/conf heads, the layout written
by reference train.py:211-213 from lib/models/ssd_v3.py:47-64) ->
tools/convert_torch_weights.convert_ssd_state_dict ->
odtpu.utils.checkpoint.load_model_npz -> numerically-identical convs.

Weights are deterministic numpy (torch-free), so the mapping itself is
what's under test: Sequential indices, OIHW->HWIO transposes, the
L2Norm scale, and both-direction completeness (every checkpoint tensor
lands; every odtpu param is covered)."""

import os.path as osp
import sys

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))

from convert_torch_weights import convert_ssd_state_dict  # noqa: E402

from odtpu.models import init_model, model_factory  # noqa: E402
from odtpu.utils.checkpoint import load_model_npz  # noqa: E402
from odtpu.utils.config import default_cfg  # noqa: E402

from test_backbone_import import _CHANNELS, make_weights  # noqa: E402

# extras conv shapes for SSD300 (reference ssd_v3.py extras_config:245
# expanded by add_extras:157-179): (cin, cout, k)
_EXTRAS = [(1024, 256, 1), (256, 512, 3), (512, 128, 1), (128, 256, 3),
           (256, 128, 1), (128, 256, 3), (256, 128, 1), (128, 256, 3)]
# head source channels and anchor counts (SSD300: 4,6,6,6,4,4)
_HEAD = [(512, 4), (1024, 6), (512, 6), (256, 6), (256, 4), (256, 4)]
_NAME_TO_TORCH_INDEX = {
    "conv1_1": 0, "conv1_2": 2, "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14,
    "conv4_1": 17, "conv4_2": 19, "conv4_3": 21,
    "conv5_1": 24, "conv5_2": 26, "conv5_3": 28,
    "conv6": 31, "conv7": 33,
}


def make_reference_state_dict(seed=0, num_classes=21):
    rs = np.random.RandomState(seed)
    sd = {}
    for name, w in make_weights(seed).items():
        conv, leaf = name.split(".")
        sd["base.{}.{}".format(_NAME_TO_TORCH_INDEX[conv], leaf)] = w
    sd["L2Norm.weight"] = (20.0 + rs.randn(512) * 0.1).astype(np.float32)
    for i, (cin, cout, k) in enumerate(_EXTRAS):
        sd["extras.{}.weight".format(i)] = (
            rs.randn(cout, cin, k, k) * np.sqrt(2.0 / (cin * k * k))
        ).astype(np.float32)
        sd["extras.{}.bias".format(i)] = (
            rs.randn(cout) * 0.05).astype(np.float32)
    for i, (cin, a) in enumerate(_HEAD):
        for mod, cout in (("loc", a * 4), ("conf", a * num_classes)):
            sd["{}.{}.weight".format(mod, i)] = (
                rs.randn(cout, cin, 3, 3) * np.sqrt(2.0 / (cin * 9))
            ).astype(np.float32)
            sd["{}.{}.bias".format(mod, i)] = (
                rs.randn(cout) * 0.05).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    sd = make_reference_state_dict()
    out, skipped = convert_ssd_state_dict(sd)
    assert not skipped, skipped
    path = tmp_path_factory.mktemp("conv") / "ssd300.npz"
    np.savez(path, **out)
    return sd, out, str(path)


@pytest.fixture(scope="module")
def loaded_params(converted):
    _, _, path = converted
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model, priors, _ = model_factory("eval", cfg)
    variables = init_model(model, cfg)
    params, loaded, skipped = load_model_npz(variables["params"], path)
    return model, priors, variables, params, loaded, skipped


def test_complete_both_directions(converted, loaded_params):
    sd, out, _ = converted
    _, _, variables, params, loaded, skipped = loaded_params
    # every checkpoint tensor converted and accepted
    assert len(out) == len(sd)
    assert not skipped, skipped
    # every odtpu param overwritten (tree fully covered — a full
    # checkpoint restore, not a partial bootstrap)
    flat = flax.traverse_util.flatten_dict(params)
    assert len(loaded) == len(flat)


def test_values_land_transposed(converted, loaded_params):
    sd, _, _ = converted
    _, _, _, params, _, _ = loaded_params
    flat = flax.traverse_util.flatten_dict(params)
    np.testing.assert_array_equal(
        flat[("backbone", "conv4_3", "conv", "kernel")],
        sd["base.21.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        flat[("head", "conf_1", "conv", "bias")], sd["conf.1.bias"])
    np.testing.assert_array_equal(
        flat[("l2norm", "scale")], sd["L2Norm.weight"])
    np.testing.assert_array_equal(
        flat[("extras_3", "conv", "kernel")],
        sd["extras.3.weight"].transpose(2, 3, 1, 0))


def test_head_conv_torch_parity(converted, loaded_params):
    """The converted loc_0 conv reproduces torch's conv2d bit-for-bit
    semantics (same weights, same input) through the whole model path:
    flatten order of the NHWC head must equal the reference's NCHW
    permute+reshape (ssd_v3.py:114-121)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    sd, _, _ = converted
    model, priors, variables, params, _, _ = loaded_params
    rs = np.random.RandomState(7)
    feat = rs.randn(1, 10, 10, 512).astype(np.float32)  # conv4_3-like

    w = torch.from_numpy(sd["loc.0.weight"])
    b = torch.from_numpy(sd["loc.0.bias"])
    tout = F.conv2d(torch.from_numpy(feat.transpose(0, 3, 1, 2)), w, b,
                    padding=1)
    # reference flatten: NCHW -> permute(0,2,3,1) -> view(B,-1,4)
    t_rows = tout.permute(0, 2, 3, 1).reshape(1, -1, 4).numpy()

    flat = flax.traverse_util.flatten_dict(params)
    k = jnp.asarray(flat[("head", "loc_0", "conv", "kernel")])
    bias = jnp.asarray(flat[("head", "loc_0", "conv", "bias")])
    jout = jax.lax.conv_general_dilated(
        jnp.asarray(feat), k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    j_rows = np.asarray(jout).reshape(1, -1, 4)
    np.testing.assert_allclose(j_rows, t_rows, rtol=2e-5, atol=2e-5)


def test_restore_eval_variables_npz(converted):
    """The demos/serve share restore_eval_variables: an .npz path loads
    the converted checkpoint; a bogus path falls back to init."""
    from odtpu.utils.checkpoint import restore_eval_variables
    _, _, path = converted
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model, priors, _ = model_factory("eval", cfg)
    variables = restore_eval_variables(model, cfg, path)
    sd = make_reference_state_dict()
    flat = flax.traverse_util.flatten_dict(variables["params"])
    np.testing.assert_array_equal(flat[("l2norm", "scale")],
                                  sd["L2Norm.weight"])
    # explicit-but-unusable paths are errors (serving random weights
    # while claiming a checkpoint would be silent garbage)...
    with pytest.raises(FileNotFoundError):
        restore_eval_variables(model, cfg, "/nonexistent")
    with pytest.raises(ValueError):
        restore_eval_variables(model, cfg, __file__)  # file, not .npz
    # ...but an empty path is an explicit "random init" request
    v2 = restore_eval_variables(model, cfg, "")
    assert ("params" in v2
            and v2["params"]["l2norm"]["scale"].shape == (512,))


def test_fpn_transform_pyramid_mapping():
    """FPN lateral/output convs (reference fpn_v2.py:45-46) land on
    transform_N/pyramid_N with the OIHW->HWIO transpose."""
    rs = np.random.RandomState(5)
    sd = {
        "transforms.1.weight": rs.randn(256, 1024, 1, 1).astype(np.float32),
        "transforms.1.bias": rs.randn(256).astype(np.float32),
        "pyramids.3.weight": rs.randn(256, 256, 3, 3).astype(np.float32),
        "pyramids.3.bias": rs.randn(256).astype(np.float32),
    }
    out, skipped = convert_ssd_state_dict(sd)
    assert not skipped
    np.testing.assert_array_equal(
        out["transform_1/conv/kernel"],
        sd["transforms.1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        out["pyramid_3/conv/bias"], sd["pyramids.3.bias"])


def test_full_detector_torch_parity(converted, loaded_params):
    """Whole-model numeric parity: a torch SSD300 forward (VGG16 base +
    L2Norm + extras + heads wired per the documented reference dataflow,
    ssd_v3.py:97-121, built from this test's own spec tables) must match
    our model.apply on the CONVERTED weights — locking conversion AND
    model semantics to torch numerics end-to-end."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from test_backbone_import import build_torch_vgg, make_weights

    sd, _, _ = converted
    model, priors, variables, params, _, _ = loaded_params

    vggnet = build_torch_vgg(make_weights(0))
    # extras conv geometry per parse_extras(EXTRAS_SPEC['ssd300']):
    # (kernel, stride, padding) per conv; relu after each
    geom = [(1, 1, 0), (3, 2, 1), (1, 1, 0), (3, 2, 1),
            (1, 1, 0), (3, 1, 0), (1, 1, 0), (3, 1, 0)]

    rs = np.random.RandomState(11)
    x = rs.randn(1, 3, 300, 300).astype(np.float32) * 40.0

    with torch.no_grad():
        t = torch.from_numpy(x)
        c43 = vggnet[:23](t)          # relu after conv4_3
        c7 = vggnet(t)                # relu after conv7
        # L2Norm: x / ||x||_2(channel) * scale  (l2norm.py:18-23)
        w = torch.from_numpy(sd["L2Norm.weight"])
        norm = c43.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10
        s0 = c43 / norm * w[None, :, None, None]
        sources = [s0, c7]
        f = c7
        for i, (k, st, p) in enumerate(geom):
            cw = torch.from_numpy(sd[f"extras.{i}.weight"])
            cb = torch.from_numpy(sd[f"extras.{i}.bias"])
            f = F.relu(F.conv2d(f, cw, cb, stride=st, padding=p))
            if i % 2 == 1:
                sources.append(f)
        locs, confs = [], []
        for i, src in enumerate(sources):
            for mod, outs in (("loc", locs), ("conf", confs)):
                cw = torch.from_numpy(sd[f"{mod}.{i}.weight"])
                cb = torch.from_numpy(sd[f"{mod}.{i}.bias"])
                o = F.conv2d(src, cw, cb, padding=1)
                outs.append(o.permute(0, 2, 3, 1).reshape(1, -1))
        t_loc = torch.cat(locs, 1).reshape(1, -1, 4).numpy()
        t_conf = torch.cat(confs, 1).reshape(1, -1, 21).numpy()

    j_loc, j_conf = model.apply({"params": params},
                                jnp.asarray(x.transpose(0, 2, 3, 1)),
                                phase="train", train=False)
    assert j_loc.shape == t_loc.shape and j_conf.shape == t_conf.shape
    np.testing.assert_allclose(np.asarray(j_loc), t_loc,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_conf), t_conf,
                               rtol=1e-4, atol=1e-3)


def test_full_forward_runs_and_regresses(loaded_params):
    """Loaded full checkpoint produces a stable forward (shape + finite
    + deterministic across two applies)."""
    model, priors, variables, params, _, _ = loaded_params
    x = jnp.asarray(np.random.RandomState(3)
                    .randn(1, 300, 300, 3).astype(np.float32))
    loc, conf = model.apply({"params": params}, x, phase="eval",
                            train=False)
    assert loc.shape == (1, 8732, 4) and conf.shape == (1, 8732, 21)
    assert bool(jnp.all(jnp.isfinite(loc)))
    loc2, _ = model.apply({"params": params}, x, phase="eval", train=False)
    np.testing.assert_array_equal(np.asarray(loc), np.asarray(loc2))


def test_batch_stats_npz_namespace(tmp_path):
    """ckpt_to_npz carries BN running stats under __batch_stats__/ keys:
    load_variables_npz restores them (BN-heavy families — RFBNet/FSSD/
    DRN — are not reproducible from params alone), while params-only
    consumers (load_model_npz, i.e. train.py --basenet trunk transfer)
    must ignore the namespace without counting it as skipped."""
    import flax.linen as nn

    from odtpu.utils.checkpoint import (BATCH_STATS_PREFIX,
                                        load_variables_npz)

    class TinyBN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3), name="stem")(x)
            return nn.BatchNorm(use_running_average=not train,
                                name="bn")(x)

    v = jax.device_get(flax.core.unfreeze(TinyBN().init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 8, 3), np.float32))))
    flat_p = flax.traverse_util.flatten_dict(v["params"])
    flat_b = flax.traverse_util.flatten_dict(v["batch_stats"])
    out = {"/".join(k): np.asarray(x) for k, x in flat_p.items()}
    # mark the stats so restoring init-identical zeros can't pass
    out.update({BATCH_STATS_PREFIX + "/".join(k):
                np.full_like(np.asarray(x), 0.75)
                for k, x in flat_b.items()})
    path = str(tmp_path / "bn.npz")
    np.savez_compressed(path, **out)

    params, loaded, skipped = load_model_npz(v["params"], path)
    assert len(loaded) == len(flat_p) and not skipped

    fresh = jax.tree.map(np.zeros_like, v)
    nv, loaded, skipped = load_variables_npz(fresh, path)
    assert not skipped
    assert len(loaded) == len(flat_p) + len(flat_b)
    for leaf in jax.tree.leaves(nv["batch_stats"]):
        np.testing.assert_allclose(np.asarray(leaf), 0.75)
    for (k, a), (_, b) in zip(
            sorted(flax.traverse_util.flatten_dict(
                nv["params"]).items()),
            sorted(flat_p.items())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
