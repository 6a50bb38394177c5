"""AOT export artifact (tools/export_model.py): the serialized
StableHLO module + flat weights must reproduce the live eval pipeline
exactly, and load back without the model zoo or the config system."""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

from odtpu.models import init_model, model_factory
from odtpu.ops.detect import detect_out_compact
from odtpu.utils.config import default_cfg
from tools.export_model import export_artifact, load_artifact


def _tiny_cfg():
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASET.IMAGE_SIZE = (64, 64)
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.STEPS = [8, 16, 32, 64]
    cfg.MODEL.MIN_SIZES = [12, 24, 40, 56]
    cfg.MODEL.MAX_SIZES = [24, 40, 56, 64]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2], [2], [2]]
    cfg.MODEL.EXTRAS = [64, "S", 128, 64, "S", 128]
    return cfg


def test_export_roundtrip_matches_live_pipeline(tmp_path, rng):
    cfg = _tiny_cfg()
    art = str(tmp_path / "tiny.odtpux")
    meta = export_artifact(art, batch=2, cfg=cfg)
    assert meta["num_weights"] > 0
    assert meta["image_size"] == [64, 64]

    call, meta2 = load_artifact(art)
    assert meta2["model"] == meta["model"]
    x = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    got = call(x)
    assert got.shape == (2, cfg.EVAL.TOP_K, 6)

    # live pipeline with the same (deterministic) init
    model, priors, _ = model_factory("eval", cfg)
    variables = init_model(model, cfg)
    mean = np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32)

    @jax.jit
    def live(vs, xb):
        xf = xb.astype(jnp.float32) - mean
        xf = xf[..., ::-1]
        loc, conf = model.apply(vs, xf, phase="eval", train=False)
        return detect_out_compact(loc, conf, jnp.asarray(priors),
                                  tuple(cfg.MODEL.VARIANCE),
                                  conf_thresh=cfg.EVAL.CONF_THRESH,
                                  nms_thresh=cfg.EVAL.NMS_THRESH,
                                  top_k=cfg.EVAL.TOP_K, impl="lax")

    want = np.asarray(live(variables, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_batchnorm_model(tmp_path):
    """BN-carrying models (drn_d_22 base) serialize too: the flat-leaf
    convention covers every variable collection, and eval-mode apply
    bakes the running stats into the graph."""
    cfg = _tiny_cfg()
    cfg.MODEL.BASE = "drn_d_22"
    art = str(tmp_path / "drn.odtpux")
    meta = export_artifact(art, batch=1, cfg=cfg)
    call, _ = load_artifact(art)
    x = np.full((1, 64, 64, 3), 127, np.uint8)
    out = call(x)
    assert out.shape == (1, cfg.EVAL.TOP_K, 6)
    assert meta["model"].endswith("drn_d_22")
    # fidelity vs the live pipeline (random-init BN decodes can overflow
    # to inf — irrelevant here; the artifact must match, not be finite)
    model, priors, _ = model_factory("eval", cfg)
    variables = init_model(model, cfg)
    mean = np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32)
    xf = (x.astype(np.float32) - mean)[..., ::-1]
    loc, conf = model.apply(variables, jnp.asarray(xf), phase="eval",
                            train=False)
    want = np.asarray(detect_out_compact(
        loc, conf, jnp.asarray(priors), tuple(cfg.MODEL.VARIANCE),
        conf_thresh=cfg.EVAL.CONF_THRESH, nms_thresh=cfg.EVAL.NMS_THRESH,
        top_k=cfg.EVAL.TOP_K, impl="lax"))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_export_polymorphic_batch(tmp_path, rng):
    cfg = _tiny_cfg()
    art = str(tmp_path / "poly.odtpux")
    meta = export_artifact(art, batch=0, cfg=cfg)
    assert meta["batch"] == 0
    call, _ = load_artifact(art)
    # one artifact serves several batch sizes; rows agree with a
    # per-batch re-export at the same weights
    fixed = str(tmp_path / "b3.odtpux")
    export_artifact(fixed, batch=3, cfg=cfg)
    call3, _ = load_artifact(fixed)
    x1 = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    x3 = rng.randint(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    assert call(x1).shape == (1, cfg.EVAL.TOP_K, 6)
    np.testing.assert_allclose(call(x3), call3(x3), rtol=1e-5, atol=1e-6)


def test_artifact_is_self_describing(tmp_path):
    cfg = _tiny_cfg()
    art = str(tmp_path / "tiny.odtpux")
    export_artifact(art, batch=1, cfg=cfg)
    with zipfile.ZipFile(art) as z:
        names = set(z.namelist())
        assert {"meta.json", "module.bin", "weights.npz"} <= names
        meta = json.loads(z.read("meta.json"))
    assert meta["platforms"] == ["cpu", "tpu"]
    assert len(meta["class_names"]) == cfg.DATASET.NUM_CLASSES

    call, meta = load_artifact(art)
    # wrong input shape is a clear error, not silent misbehavior
    try:
        call(np.zeros((1, 32, 32, 3), np.uint8))
    except ValueError as e:
        assert "shape" in str(e)
    else:
        raise AssertionError("shape mismatch not rejected")
    out = call(np.zeros((1, 64, 64, 3), np.uint8))
    assert np.isfinite(out).all()


def test_export_int8_quantized_graph(tmp_path, rng):
    """--quant int8 serializes the quantized eval graph itself (s8 convs
    are plain StableHLO): the artifact reproduces the live int8 pipeline
    exactly and records its mode in meta."""
    from odtpu.models.common import quantized

    cfg = _tiny_cfg()
    art = str(tmp_path / "tiny_int8.odtpux")
    meta = export_artifact(art, batch=2, cfg=cfg, quant="int8")
    assert meta["quant"] == "int8"

    call, _ = load_artifact(art)
    x = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    got = call(x)
    assert got.shape == (2, cfg.EVAL.TOP_K, 6)
    assert np.isfinite(got).all()

    model, priors, _ = model_factory("eval", cfg)
    variables = init_model(model, cfg)
    mean = np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32)

    @jax.jit
    def live(vs, xb):
        xf = xb.astype(jnp.float32) - mean
        xf = xf[..., ::-1]
        with quantized("int8"):
            loc, conf = model.apply(vs, xf, phase="eval", train=False)
        return detect_out_compact(loc, conf, jnp.asarray(priors),
                                  tuple(cfg.MODEL.VARIANCE),
                                  conf_thresh=cfg.EVAL.CONF_THRESH,
                                  nms_thresh=cfg.EVAL.NMS_THRESH,
                                  top_k=cfg.EVAL.TOP_K, impl="lax")

    want = np.asarray(live(variables, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
