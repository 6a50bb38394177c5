"""End-to-end integration: train.py / eval.py CLIs on a synthetic VOC
tree (the reference's test8 smoke protocol, cfgs/tests/test_train_voc.yml).
Uses a small input size to keep the CPU mesh fast."""

import os
import os.path as osp
import sys

import numpy as np
import pytest

from synth import make_voc

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    make_voc(str(root / "data" / "VOCdevkit"), setname="test8", n_images=8,
             seed=7)
    cfg_path = root / "smoke.yml"
    cfg_path.write_text(
        "GENERAL:\n"
        "  ROOT_DIR: '{root}'\n"
        "DATASET:\n"
        "  NAME: 'VOC0712'\n"
        "  SUB_DIR: 'VOCdevkit'\n"
        "  TRAIN_SETS: (('2007', 'test8'),)\n"
        "  TEST_SETS: (('2007', 'test8'),)\n"
        "  NUM_CLASSES: 20\n"
        "  TRAIN_BATCH_SIZE: 8\n"
        "  EVAL_BATCH_SIZE: 8\n"
        "  NUM_WORKERS: 2\n"
        "  IMAGE_SIZE: (128, 128)\n"
        "  MAX_BOXES: 10\n"
        "MODEL:\n"
        "  SSD_TYPE: 'SSD'\n"
        "  IMAGE_SIZE: (128, 128)\n"
        "  EXTRAS: [128, 'S', 256, 64, 'S', 128]\n"
        "  STEPS: [8, 16, 32, 64]\n"
        "  MIN_SIZES: [16, 32, 64, 96]\n"
        "  MAX_SIZES: [32, 64, 96, 128]\n"
        "  ASPECT_RATIOS: [[2], [2], [2], [2]]\n"
        "TPU:\n"
        "  COMPUTE_DTYPE: 'float32'\n"
        "TRAIN:\n"
        "  OPTIMIZER:\n"
        "    LR: 1.0e-5\n"
        "    CLIP_GRAD_NORM: 10.0\n"
        "  MAX_ITER: 4\n"
        "  EVAL_ITER: 4\n"
        "  SAVE_ITER: 2\n"
        "  LOG_LOSS_ITER: 1\n"
        "  LR_SCHEDULER:\n"
        "    STEPS: (2, 3)\n".format(root=root))
    return root, str(cfg_path)


def test_train_cli_smoke(workspace, capsys):
    root, cfg_path = workspace
    import train as train_mod
    out_dir = str(root / "out")
    train_mod.main(["--cfg", cfg_path, "--cfg_name", "smoke",
                    "--output_dir", out_dir])
    captured = capsys.readouterr().out
    assert "mAP" in captured
    assert "done at iter 4" in captured
    # checkpoint written
    assert osp.isdir(osp.join(out_dir, "ckpt"))
    ckpt_steps = os.listdir(osp.join(out_dir, "ckpt"))
    assert any(s.isdigit() for s in ckpt_steps)
    # eval artifacts in the run dir, never the dataset tree
    assert osp.isfile(osp.join(out_dir, "eval", "det_test8_aeroplane.txt"))
    assert not osp.isdir(
        osp.join(str(root), "data", "VOCdevkit", "VOC2007", "results"))


def test_eval_cli_smoke(workspace, capsys):
    root, cfg_path = workspace
    import eval as eval_mod
    out_dir = str(root / "out")
    eval_mod.main(["--cfg", cfg_path, "--cfg_name", "smoke",
                   "--ckpt", osp.join(out_dir, "ckpt"),
                   "--output_dir", str(root / "eval_out")])
    captured = capsys.readouterr().out
    assert "restored step" in captured
    assert "mAP" in captured


def test_resume_continues_step(workspace, capsys):
    root, cfg_path = workspace
    import train as train_mod
    out_dir = str(root / "out")
    train_mod.main(["--cfg", cfg_path, "--cfg_name", "smoke",
                    "--output_dir", str(root / "out2"),
                    "--resume", osp.join(out_dir, "ckpt"),
                    "--max_iter", "6"])
    captured = capsys.readouterr().out
    assert "resumed at step 4" in captured
    assert "done at iter 6" in captured


def test_auto_resume_fresh_then_continue(workspace, capsys):
    """--auto_resume: first run starts fresh (no checkpoint yet), the
    identical re-run picks up the saved step — what makes a queued
    contract command idempotent under the supervisor's stall-kill."""
    root, cfg_path = workspace
    import train as train_mod
    out_dir = str(root / "out_auto")
    train_mod.main(["--cfg", cfg_path, "--cfg_name", "smoke",
                    "--output_dir", out_dir, "--auto_resume"])
    first = capsys.readouterr().out
    assert "auto-resume" not in first
    assert "done at iter 4" in first
    train_mod.main(["--cfg", cfg_path, "--cfg_name", "smoke",
                    "--output_dir", out_dir, "--auto_resume",
                    "--max_iter", "6"])
    second = capsys.readouterr().out
    assert "auto-resume: checkpoint found" in second
    assert "resumed at step 4" in second
    assert "done at iter 6" in second


def test_resume_argv_strips_basenet_and_old_resume():
    import train as train_mod
    argv = ["--cfg", "a.yml", "--basenet", "w.npz", "--resume=/old",
            "--cfg_name", "x", "--basenet=other.npz"]
    out = train_mod._resume_argv(argv, "/run/ckpt")
    assert out == ["--cfg", "a.yml", "--cfg_name", "x",
                   "--resume", "/run/ckpt"]


def test_rss_guard_reexecs_with_resume(workspace, capsys, monkeypatch):
    """--max_rss_gb below any real process RSS must trigger the save +
    re-exec path at the first SAVE_ITER: os.execv is called with the
    original argv minus --basenet/--resume plus --resume <run ckpt>."""
    root, cfg_path = workspace
    import train as train_mod
    calls = {}

    class _Exec(Exception):
        pass

    def fake_execv(exe, argv):
        calls["exe"], calls["argv"] = exe, argv
        raise _Exec()

    monkeypatch.setattr(train_mod.os, "execv", fake_execv)
    out_dir = str(root / "out_rss")
    with pytest.raises(_Exec):
        train_mod.main(["--cfg", cfg_path, "--cfg_name", "smoke",
                        "--output_dir", out_dir, "--max_rss_gb", "0.01"])
    captured = capsys.readouterr().out
    assert "re-exec with --resume at iter 2" in captured
    assert calls["exe"] == sys.executable
    assert calls["argv"][-2:] == ["--resume", osp.join(out_dir, "ckpt")]
    assert "--max_rss_gb" in calls["argv"]  # original args preserved
    # the checkpoint the re-exec will resume from exists
    assert osp.isdir(osp.join(out_dir, "ckpt", "2"))


@pytest.fixture(scope="module")
def coco_workspace(tmp_path_factory):
    from synth import make_coco
    root = tmp_path_factory.mktemp("wsc")
    make_coco(str(root / "data" / "coco"), split="val2014", n_images=8,
              seed=3)
    cfg_path = root / "coco_smoke.yml"
    cfg_path.write_text(
        "GENERAL:\n"
        "  ROOT_DIR: '{root}'\n"
        "DATASET:\n"
        "  NAME: 'COCO2014'\n"
        "  SUB_DIR: 'coco'\n"
        "  TRAIN_SETS: (('2014', 'val'),)\n"
        "  TEST_SETS: (('2014', 'val'),)\n"
        "  NUM_CLASSES: 5\n"
        "  TRAIN_BATCH_SIZE: 8\n"
        "  EVAL_BATCH_SIZE: 8\n"
        "  NUM_WORKERS: 2\n"
        "  IMAGE_SIZE: (128, 128)\n"
        "  MAX_BOXES: 10\n"
        "  CACHE_IMAGES: True\n"
        "MODEL:\n"
        "  SSD_TYPE: 'SSD'\n"
        "  IMAGE_SIZE: (128, 128)\n"
        "  EXTRAS: [128, 'S', 256, 64, 'S', 128]\n"
        "  STEPS: [8, 16, 32, 64]\n"
        "  MIN_SIZES: [16, 32, 64, 96]\n"
        "  MAX_SIZES: [32, 64, 96, 128]\n"
        "  ASPECT_RATIOS: [[2], [2], [2], [2]]\n"
        "TPU:\n"
        "  COMPUTE_DTYPE: 'float32'\n"
        "TRAIN:\n"
        "  OPTIMIZER:\n"
        "    LR: 1.0e-5\n"
        "    CLIP_GRAD_NORM: 10.0\n"
        "  MAX_ITER: 3\n"
        "  EVAL_ITER: 3\n"
        "  SAVE_ITER: 3\n"
        "  LOG_LOSS_ITER: 1\n"
        "  LR_SCHEDULER:\n"
        "    STEPS: (2,)\n".format(root=root))
    return root, str(cfg_path)


def test_train_cli_smoke_coco(coco_workspace, capsys):
    """The COCO dataset composed through the real train.py CLI: threaded
    loader on a synthetic COCO tree, train steps, in-training EvalCOCO
    (mAP@0.5 and mAP@[.5:.95]), checkpoint. Mirrors the reference's
    cfgs/tests/test_train_coco.yml smoke protocol."""
    root, cfg_path = coco_workspace
    import train as train_mod
    out_dir = str(root / "out")
    train_mod.main(["--cfg", cfg_path, "--cfg_name", "coco_smoke",
                    "--output_dir", out_dir])
    captured = capsys.readouterr().out
    assert "mAP" in captured
    assert "done at iter 3" in captured
    assert osp.isdir(osp.join(out_dir, "ckpt"))
