"""Smoke tests for the observability extras: input-gradient saliency,
per-feature-map anchor renderings, step-by-step augmentation dumps, and
end-of-run TB archival (reference visualize_utils.py:152-202,
prior_box.py:55-90, augmentations.py:395-404, train.py:197-208)."""

import glob
import os

import numpy as np
import jax.numpy as jnp

from odtpu.utils.config import default_cfg, update_cfg
from odtpu.utils.logging import TBWriter
from odtpu.utils.visualize import viz_grads, viz_prior_anchors


def _event_files(d):
    return glob.glob(os.path.join(d, "**", "events.out.tfevents.*"),
                     recursive=True)


def test_viz_grads_writes_images(tmp_path):
    tb = TBWriter(str(tmp_path))

    def source_fn(x):  # two fake "feature maps" of the input
        return [x * 3.0, jnp.square(x)]

    img = np.full((8, 8, 3), 50.0, np.float32)
    viz_grads(source_fn, img, (104, 117, 123), tb)
    tb.close()
    files = _event_files(str(tmp_path))
    # an empty SummaryWriter event file is ~88 bytes; two 8x8 PNG image
    # summaries push it well past 300
    assert files and os.path.getsize(files[0]) > 300


def test_viz_grads_values():
    """d sum(3x)/dx = 3 everywhere -> clamped grad 3 + mean."""
    logged = {}

    class FakeTB:
        def add_image(self, tag, img, step):
            logged[tag] = np.asarray(img)

    viz_grads(lambda x: [x * 3.0], np.zeros((4, 4, 3), np.float32),
              (104, 117, 123), FakeTB())
    img = logged["module_grads/source_0"]
    # means are BGR; the RGB-ordered image gets them flipped
    assert img[0, 0, 0] == 123 + 3 and img[0, 0, 2] == 104 + 3


def test_viz_prior_anchors(tmp_path):
    from odtpu.ops import PriorBoxSSD
    cfg = default_cfg()
    cfg.MODEL.STEPS = [8, 16]
    cfg.MODEL.MIN_SIZES = [30, 60]
    cfg.MODEL.MAX_SIZES = [60, 111]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2]]
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    pb = PriorBoxSSD(cfg)
    tb = TBWriter(str(tmp_path))
    viz_prior_anchors(pb, [(8, 8), (4, 4)], tb)
    tb.close()
    files = _event_files(str(tmp_path))
    # 2 maps x 4 anchor slots = 8 images in the event file
    assert files and os.path.getsize(files[0]) > 2000


def test_augmentation_step_dumps(tmp_path):
    from odtpu.data import SSDAugmentation
    tb = TBWriter(str(tmp_path))
    aug = SSDAugmentation((64, 64))
    aug.attach_writer(tb, max_dumps=2)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 120, 3)).astype(np.uint8)
    boxes = np.array([[0.1, 0.1, 0.6, 0.6]], np.float32)
    labels = np.array([3], np.int64)
    for _ in range(4):  # only the first 2 items dump
        aug(img, boxes, labels, rng=rng)
    assert aug._dumps_done == 2
    assert aug._claim_dump_slot() is None  # budget spent
    tb.close()
    files = _event_files(str(tmp_path))
    assert files and os.path.getsize(files[0]) > 5000


def test_backup_jobs(tmp_path):
    import argparse
    from train import backup_jobs
    cfg = default_cfg()
    update_cfg(cfg)
    cfg.GENERAL.HISTORY_ROOT = str(tmp_path / "history")
    out_dir = tmp_path / "out"
    log_dir = tmp_path / "logs"
    out_dir.mkdir()
    log_dir.mkdir()
    (out_dir / "config_used.yml").write_text("TRAIN: {}\n")
    (log_dir / "events.out.tfevents.123").write_bytes(b"\x00" * 64)
    args = argparse.Namespace(job_group="base", cfg_name="smoke")
    backup_jobs(cfg, str(out_dir), str(log_dir), args)
    dst = tmp_path / "history" / "base" / "smoke"
    assert (dst / "smoke.yml").is_file()
    assert (dst / "events.out.tfevents.123").is_file()
    # collisions get the first free numbered suffix (the reference's
    # fixed "_n" rename, train.py:200-203, silently MERGES a third run
    # into the second's backup; numbering keeps every run separate)
    backup_jobs(cfg, str(out_dir), str(log_dir), args)
    assert (tmp_path / "history" / "base" / "smoke_1" / "smoke.yml").is_file()
    backup_jobs(cfg, str(out_dir), str(log_dir), args)
    assert (tmp_path / "history" / "base" / "smoke_2" / "smoke.yml").is_file()


def test_resolve_cfg_args_naming():
    """Explicit --cfg derives run naming from the yaml path so runs
    don't collide under the default cfg_name's dirs (the wart: a
    --cfg cfgs/tests/x.yml run used to back up into history/base/
    ssd_vgg16_voc)."""
    import argparse

    from odtpu.utils.config import resolve_cfg_args

    a = argparse.Namespace(cfg="cfgs/tests/refinedet_synth.yml",
                           cfg_name="", job_group="")
    assert resolve_cfg_args(a) == "cfgs/tests/refinedet_synth.yml"
    assert a.cfg_name == "refinedet_synth"
    assert a.job_group == "tests"
    b = argparse.Namespace(cfg=None, cfg_name="x", job_group="g")
    assert resolve_cfg_args(b) == "cfgs/g/x.yml"
    assert (b.cfg_name, b.job_group) == ("x", "g")
    # explicit names win over the path derivation (so eval can target a
    # run dir named before/differently from the yaml path)
    c = argparse.Namespace(cfg="cfgs/tests/refinedet_synth.yml",
                           cfg_name="old_run", job_group="base")
    assert resolve_cfg_args(c) == "cfgs/tests/refinedet_synth.yml"
    assert (c.cfg_name, c.job_group) == ("old_run", "base")
    # no --cfg, sentinel names -> reference defaults
    d = argparse.Namespace(cfg="", cfg_name="", job_group="")
    assert resolve_cfg_args(d) == "cfgs/base/ssd_vgg16_voc.yml"
    assert (d.cfg_name, d.job_group) == ("ssd_vgg16_voc", "base")
