"""Model zoo tests: SSD300/512 shapes, dims probe, prior count consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odtpu.models import model_factory, init_model, probe_layer_dims
from odtpu.models.ssd import parse_extras, EXTRAS_SPEC
from odtpu.utils.config import default_cfg


def _cpu_cfg(size=300):
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"  # CPU test mesh
    if size == 512:
        cfg.DATASET.IMAGE_SIZE = (512, 512)
        cfg.MODEL.IMAGE_SIZE = (512, 512)
        cfg.MODEL.STEPS = [8, 16, 32, 64, 128, 256, 512]
        cfg.MODEL.MIN_SIZES = [35.84, 76.8, 153.6, 230.4, 307.2, 384.0, 460.8]
        cfg.MODEL.MAX_SIZES = [76.8, 153.6, 230.4, 307.2, 384.0, 460.8, 537.6]
        cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]]
    return cfg


def test_parse_extras_ssd300():
    got = parse_extras(EXTRAS_SPEC["ssd300"])
    want = [(256, 1, 1, 0), (512, 3, 2, 1), (128, 1, 1, 0), (256, 3, 2, 1),
            (128, 1, 1, 0), (256, 3, 1, 0), (128, 1, 1, 0), (256, 3, 1, 0)]
    assert got == want


def test_parse_extras_ssd512():
    got = parse_extras(EXTRAS_SPEC["ssd512"])
    assert len(got) == 10
    assert got[1] == (512, 3, 2, 1)
    assert all(k == (3 if i % 2 else 1) for i, (_, k, _, _) in enumerate(got))


def test_ssd300_dims_and_priors():
    cfg = _cpu_cfg(300)
    model, priors, dims = model_factory("train", cfg)
    assert dims == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    assert priors.shape == (8732, 4)
    assert cfg.MODEL.NUM_PRIOR == [4, 6, 6, 6, 4, 4]


def test_ssd300_forward_shapes():
    cfg = _cpu_cfg(300)
    model, priors, dims = model_factory("train", cfg)
    variables = init_model(model, cfg, batch_size=2)
    x = jnp.zeros((2, 300, 300, 3), jnp.float32)
    loc, conf = model.apply(variables, x, phase="train", train=False)
    assert loc.shape == (2, 8732, 4)
    assert conf.shape == (2, 8732, 21)
    assert loc.dtype == jnp.float32

    loc_e, conf_e = model.apply(variables, x, phase="eval", train=False)
    s = np.asarray(conf_e.sum(-1))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)  # softmaxed in eval phase


def test_ssd512_dims_and_priors():
    cfg = _cpu_cfg(512)
    model, priors, dims = model_factory("train", cfg)
    assert dims == [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2),
                    (1, 1)]
    expected = sum(a * h * w
                   for a, (h, w) in zip(cfg.MODEL.NUM_PRIOR, dims))
    assert priors.shape == (expected, 4)
    variables = init_model(model, cfg)
    x = jnp.zeros((1, 512, 512, 3), jnp.float32)
    loc, conf = model.apply(variables, x)
    assert loc.shape == (1, expected, 4)


def test_forward_jit_compiles_once():
    cfg = _cpu_cfg(300)
    model, priors, dims = model_factory("train", cfg)
    variables = init_model(model, cfg)
    fwd = jax.jit(lambda v, x: model.apply(v, x), static_argnums=())
    x = jnp.zeros((1, 300, 300, 3), jnp.float32)
    loc1, _ = fwd(variables, x)
    loc2, _ = fwd(variables, x + 1.0)
    assert np.isfinite(np.asarray(loc2)).all()


def test_num_classes_follows_dataset():
    cfg = _cpu_cfg(300)
    cfg.DATASET.NUM_CLASSES = 80
    from odtpu.utils.config import update_cfg
    update_cfg(cfg)
    model, priors, dims = model_factory("train", cfg)
    variables = init_model(model, cfg)
    _, conf = model.apply(variables, jnp.zeros((1, 300, 300, 3)))
    assert conf.shape[-1] == 81
