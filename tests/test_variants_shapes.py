"""Zero-FLOP shape coverage for heavy variants via jax.eval_shape
(no forward compute — safe for the CPU suite), plus checkpoint
roundtrip and config-merge behaviors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odtpu.models import create_model, model_factory, probe_layer_dims
from odtpu.utils.config import default_cfg, load_cfg, merge_cfg_from_file


def _cfg(ssd_type, size, base="vgg16"):
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.SSD_TYPE = ssd_type
    cfg.MODEL.BASE = base
    cfg.DATASET.IMAGE_SIZE = (size, size)
    cfg.MODEL.IMAGE_SIZE = (size, size)
    if size == 512:
        cfg.MODEL.STEPS = [8, 16, 32, 64, 128, 256, 512]
        cfg.MODEL.MIN_SIZES = [35.84, 76.8, 153.6, 230.4, 307.2, 384.0,
                               460.8]
        cfg.MODEL.MAX_SIZES = [76.8, 153.6, 230.4, 307.2, 384.0, 460.8,
                               537.6]
        cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2, 3], [2, 3], [2, 3],
                                   [2], [2]]
    return cfg


def test_rfbnet512_dims():
    cfg = _cfg("RFBNet", 512)
    model, prior = create_model(cfg)
    dims = probe_layer_dims(model, cfg.MODEL.IMAGE_SIZE)
    assert dims == [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2),
                    (1, 1)]


def test_fpn512_dims():
    cfg = _cfg("FPN", 512)
    model, prior = create_model(cfg)
    dims = probe_layer_dims(model, cfg.MODEL.IMAGE_SIZE)
    assert len(dims) == 7
    assert dims[0] == (64, 64) and dims[-1] == (1, 1)


def test_rectangle_input_dims():
    """Non-square input: priors derive from measured dims (the probing
    contract the reference implements with hooks)."""
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # (600, 300) like the reference's test_rectangle (extras are keyed by
    # width = IMAGE_SIZE[-1], prior_box.py:178-191 + ssd_v3.py:56)
    cfg.DATASET.IMAGE_SIZE = (600, 300)
    cfg.MODEL.IMAGE_SIZE = (600, 300)
    model, priors, dims = model_factory("train", cfg)
    assert dims[0] == (75, 38)
    total = sum(a * h * w
                for a, (h, w) in zip(cfg.MODEL.NUM_PRIOR, dims))
    assert priors.shape == (total, 4)


def test_checkpoint_roundtrip(tmp_path):
    from odtpu.parallel import create_train_state
    from odtpu.utils.checkpoint import Checkpointer
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASET.IMAGE_SIZE = (64, 64)
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.STEPS = [8, 16, 32, 64]
    cfg.MODEL.MIN_SIZES = [8, 16, 32, 48]
    cfg.MODEL.MAX_SIZES = [16, 32, 48, 64]
    cfg.MODEL.ASPECT_RATIOS = [[2]] * 4
    cfg.MODEL.EXTRAS = [64, "S", 128, 64, "S", 128]
    model, priors, _ = model_factory("train", cfg)
    state, tx = create_train_state(model, cfg)
    state = state.replace(step=jnp.asarray(1234, jnp.int32))

    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(1234, state)
    assert ck.latest_step() == 1234
    restored = Checkpointer(str(tmp_path / "ckpt")).restore(state)
    assert int(np.asarray(restored.step)) == 1234
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # duplicate save of the same step is a no-op, force overwrites
    ck.save(1234, state)
    ck.save(1234, state, force=True)


def test_config_merge_strict(tmp_path):
    y = tmp_path / "bad.yml"
    y.write_text("MODEL:\n  NO_SUCH_KEY: 1\n")
    with pytest.raises(KeyError):
        load_cfg(str(y))


def test_config_merge_coercion(tmp_path):
    y = tmp_path / "ok.yml"
    y.write_text(
        "DATASET:\n"
        "  TRAIN_SETS: (('2007', 'trainval'),)\n"  # str -> tuple literal
        "  IMAGE_SIZE: (512, 512)\n"
        "TRAIN:\n"
        "  OPTIMIZER:\n"
        "    LR: 0.004\n")
    cfg = load_cfg(str(y))
    assert cfg.DATASET.TRAIN_SETS == (("2007", "trainval"),)
    assert cfg.DATASET.IMAGE_SIZE == (512, 512)
    assert cfg.MODEL.IMAGE_SIZE == (512, 512)  # derived by update_cfg
    assert cfg.TRAIN.OPTIMIZER.LR == 0.004


def test_shipped_configs_load():
    import glob
    import os.path as osp
    root = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "cfgs")
    files = glob.glob(osp.join(root, "*", "*.yml"))
    assert len(files) >= 12
    for f in files:
        cfg = load_cfg(f)
        assert cfg.MODEL.NUM_CLASSES == cfg.DATASET.NUM_CLASSES + 1


def test_round2_zoo_configs_build():
    """COCO-SSD512 / RFBNet512 / drn_d_24 configs construct real models
    whose measured source maps match their prior specs (eval_shape
    only — no FLOPs)."""
    import os.path as osp
    root = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "cfgs")
    expect = {
        "base/ssd_vgg16_coco_image512.yml": 7,
        "rfb/rfbnet512_vgg16_voc.yml": 7,
        "drn/ssd_drn24_voc.yml": 6,
    }
    for rel, n_maps in expect.items():
        cfg = load_cfg(osp.join(root, rel))
        cfg.TPU.COMPUTE_DTYPE = "float32"
        model, prior = create_model(cfg)
        dims = probe_layer_dims(model, cfg.MODEL.IMAGE_SIZE)
        assert len(dims) == n_maps == len(prior.num_priors), rel


def test_flops_oracle_exact():
    """Analytic conv MACs (reference hook formula) for the default
    SSD300-VGG16 equal the reference's expected constant EXACTLY
    (/root/reference/get_flops.py:70) — a hard architecture-parity
    regression oracle: any conv shape/stride/channel drift breaks it."""
    import sys
    import os.path as osp
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from get_flops import conv_breakdown
    cfg = default_cfg()
    rows, gmacs = conv_breakdown(cfg)
    assert len(rows) == 35  # 15 vgg convs + 8 extras + 6 loc + 6 conf
    assert abs(gmacs - 31.386288) < 1e-6, gmacs
