"""Config system: Python-default tree + strict YAML overlay.

Same contract as the reference Detectron-style singleton config
(/root/reference/lib/utils/config.py:17-275): hard-coded defaults, YAML
overlay with unknown-key rejection and type coercion (tuple<->list,
string literal_eval). Differences, deliberate:

- no module-global singleton: ``default_cfg()`` returns a fresh tree so
  tests / multi-model processes don't fight over shared state. A module
  level ``cfg`` is still exported for script convenience.
- a TPU section controls dtype, mesh axes and batch sharding (the
  reference's GENERAL.CUDA_VISIBLE_DEVICES equivalent).
"""

from __future__ import annotations

import copy
import os.path as osp
from ast import literal_eval

import numpy as np
import yaml


class AttrDict(dict):
    """dict with attribute access (cfg.MODEL.NUM_CLASSES)."""

    def __getattr__(self, name):
        if name in self.__dict__:
            return self.__dict__[name]
        if name in self:
            return self[name]
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if name in self.__dict__:
            self.__dict__[name] = value
        else:
            self[name] = value


def default_cfg() -> AttrDict:
    """Build the default config tree (values match the reference defaults,
    /root/reference/lib/utils/config.py:43-172, unless marked TPU-new)."""
    C = AttrDict()

    # ---------------- General ----------------
    C.GENERAL = AttrDict()
    C.GENERAL.ROOT_DIR = osp.abspath(osp.join(osp.dirname(__file__), "..", ".."))
    C.GENERAL.CFG_ROOT = osp.join(C.GENERAL.ROOT_DIR, "cfgs")
    C.GENERAL.JOB_GROUP = "base"
    C.GENERAL.WEIGHTS_ROOT = osp.join(C.GENERAL.ROOT_DIR, "weights")
    C.GENERAL.HISTORY_ROOT = osp.join(C.GENERAL.ROOT_DIR, "history")

    # ---------------- TPU / device (new) ----------------
    C.TPU = AttrDict()
    # compute dtype for convs/matmuls ('bfloat16' rides the MXU at 2x; params stay f32)
    C.TPU.COMPUTE_DTYPE = "bfloat16"
    # mesh axis sizes; -1 on DATA = use all remaining devices
    C.TPU.MESH_DATA = -1
    C.TPU.MESH_MODEL = 1
    # spatial partitioning: shard the image H axis over this many
    # devices (GSPMD inserts conv halo exchanges); for large-image /
    # small-batch regimes (e.g. SSD512) where batch parallelism alone
    # can't fill a slice. Input H must be divisible by it.
    C.TPU.MESH_SPATIAL = 1
    # remat (rematerialize backbone activations to trade FLOPs for HBM)
    C.TPU.REMAT = False
    # quantized EVAL/serving compute: "" (off) or "int8" — dynamic
    # per-image activation / per-channel weight quantization onto the
    # s8 MXU path (~2x conv rate on v5e); training is unaffected, any
    # f32 checkpoint serves quantized as-is (odtpu/ops/quant.py)
    C.TPU.QUANT = ""

    # ---------------- Log ----------------
    C.LOG = AttrDict()
    C.LOG.ROOT_DIR = osp.join(C.GENERAL.ROOT_DIR, "logs")
    C.LOG.SHOW_PR_CURVE = False
    C.LOG.SHOW_TEST_IMAGE = False
    # step-by-step augmentation dumps (ref augmentations.py:395-404)
    C.LOG.SHOW_AUG_STEPS = False
    # per-feature-map anchor renderings (ref prior_box.py:55-90 @vis)
    C.LOG.SHOW_ANCHOR_MAPS = False
    # input-gradient saliency maps (ref visualize_utils.py:152-202)
    C.LOG.SHOW_SALIENCY = False

    # ---------------- Dataset ----------------
    C.DATASET = AttrDict()
    C.DATASET.NAME = "VOC0712"
    C.DATASET.SUB_DIR = "VOCdevkit"
    # "" = derive from ROOT_DIR/data/SUB_DIR in update_cfg; an explicit
    # path (YAML or code) is respected
    C.DATASET.DATASET_DIR = ""
    C.DATASET.TRAIN_SETS = (("2007", "trainval"), ("2012", "trainval"))
    C.DATASET.TEST_SETS = (("2007", "test"),)
    C.DATASET.NUM_CLASSES = 20
    C.DATASET.IMAGE_SIZE = (300, 300)  # (h, w)
    C.DATASET.PROB = 0.6
    C.DATASET.PIXEL_MEANS = (104, 117, 123)  # BGR means, subtracted pre-net
    C.DATASET.TRAIN_BATCH_SIZE = 32
    C.DATASET.EVAL_BATCH_SIZE = 32
    C.DATASET.NUM_WORKERS = 8
    C.DATASET.NUM_EVAL_PICS = 0
    # fixed-shape padding for variable-length ground truth (TPU-new):
    # targets are padded to [MAX_BOXES, 5] with label -1
    C.DATASET.MAX_BOXES = 60
    # TPU-new: run PhotometricDistort + mean-subtract inside the train
    # step (host ships uint8, 4x less H2D); False = reference host order
    C.DATASET.DEVICE_PHOTOMETRIC = False
    # Master switch for PhotometricDistort (host or device). False keeps
    # geometry aug (expand/crop/mirror) but skips the color jitter —
    # needed by contracts on synthetic data whose class signal is pure
    # chroma (measured: an ORACLE nearest-palette classifier is 74.5%
    # wrong under the distortion at 80 classes; see BENCH_NOTES round-4)
    C.DATASET.PHOTOMETRIC = True
    # TPU-new: opt-in decoded-image RAM cache — JPEG decode dominates
    # the host loader once geometry runs in the native sampler
    # (odtpu/data/cache.py); bounded, no eviction
    C.DATASET.CACHE_IMAGES = False
    C.DATASET.CACHE_GB = 8.0

    # ---------------- Model ----------------
    C.MODEL = AttrDict()
    C.MODEL.BASE = "vgg16"
    C.MODEL.SSD_TYPE = "SSD"
    C.MODEL.PRIOR_TYPE = "PriorBoxSSD"
    C.MODEL.NUM_PRIOR = None  # derived: anchors per cell, per feature map
    C.MODEL.NUM_CLASSES = 21  # derived: DATASET.NUM_CLASSES + background
    C.MODEL.IMAGE_SIZE = (300, 300)
    # prior-box spec (SSD300 defaults)
    C.MODEL.STEPS = [8, 16, 32, 64, 100, 300]
    C.MODEL.MIN_SIZES = [30, 60, 111, 162, 213, 264]
    C.MODEL.MAX_SIZES = [60, 111, 162, 213, 264, 315]
    C.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2, 3], [2, 3], [2], [2]]
    C.MODEL.VARIANCE = [0.1, 0.2]
    C.MODEL.CLIP = True
    C.MODEL.FLIP = True
    # extras spec (reference format, ssd_v3.py:245); [] = built-in for the
    # image size ('ssd300'/'ssd512')
    C.MODEL.EXTRAS = []
    # FSSD/FPN fusion width etc. live under the variant keys when needed
    C.MODEL.BATCH_NORM = False

    # ---------------- Loss ----------------
    # reference hardcodes these at the MultiBoxLoss call site (train.py:99-100)
    C.LOSS = AttrDict()
    C.LOSS.OVERLAP_THRESH = 0.5
    C.LOSS.NEG_POS_RATIO = 3
    C.LOSS.LOC_WEIGHT = 1.0
    # RepGT repulsion term weight (crowd scenes); 0 disables. The
    # reference ships RepulsionLoss unwired (multibox_loss_backup.py).
    C.LOSS.REPULSION_WEIGHT = 0.0
    # RefineDet from-scratch curriculum: for the first N iters the ODM
    # matches GT against the RAW anchor grid (stable SSD-style class
    # targets) instead of the ARM-refined anchors; 0 = paper behavior
    # (always refined — correct with a pretrained backbone, where the
    # ARM is meaningful within hundreds of iters). Measured need: from
    # scratch, matching vs untrained refined anchors feeds the ODM
    # pure label noise until the ARM converges, the conf head collapses
    # toward uniform and never recovers (iter-6k ODM class accuracy on
    # positives 0.112 while a fresh linear probe on the SAME TCB
    # features scores 0.845 held-out — tools/diag_refinedet.py,
    # tools/probe_tcb_features.py).
    C.LOSS.ODM_MATCH_WARM_ITERS = 0

    # ---------------- Train ----------------
    C.TRAIN = AttrDict()
    C.TRAIN.MAX_ITER = 120000
    C.TRAIN.EVAL_ITER = 10000
    C.TRAIN.SAVE_ITER = 10000
    C.TRAIN.LOG_LOSS_ITER = 10
    C.TRAIN.RESUME = ""
    C.TRAIN.BASENET_WEIGHTS = ""  # npz with converted backbone weights

    C.TRAIN.OPTIMIZER = AttrDict()
    C.TRAIN.OPTIMIZER.OPTIMIZER = "sgd"
    C.TRAIN.OPTIMIZER.LR = 1e-3
    C.TRAIN.OPTIMIZER.MOMENTUM = 0.9
    C.TRAIN.OPTIMIZER.WEIGHT_DECAY = 5e-4
    # global-norm gradient clipping; 0 disables (TPU-new: large-batch /
    # from-scratch stability; the reference has no clipping)
    C.TRAIN.OPTIMIZER.CLIP_GRAD_NORM = 0.0

    C.TRAIN.LR_SCHEDULER = AttrDict()
    C.TRAIN.LR_SCHEDULER.SCHEDULER = "step"
    C.TRAIN.LR_SCHEDULER.STEPS = (80000, 100000, 120000)
    C.TRAIN.LR_SCHEDULER.GAMMA = 0.1
    C.TRAIN.LR_SCHEDULER.WARMUP_ITERS = 0  # TPU-new: linear warmup helps large batch

    # ---------------- Eval ----------------
    C.EVAL = AttrDict()
    C.EVAL.TOP_K = 200
    C.EVAL.CONF_THRESH = 0.01
    C.EVAL.NMS_THRESH = 0.45
    C.EVAL.USE_07_METRIC = True
    # compact device->host transport for eval detections ([B,top_k,6]
    # cross-class rows + dropped counter) vs the dense reference-contract
    # tensor [B,C,top_k,5]. Compact is the SSD paper's intended 200/image
    # cap (the reference's own filter, detection.py:60-63, is a no-op
    # bug); the evaluator reports any detections the cap discarded.
    C.EVAL.COMPACT = True
    # cross-class row budget of the compact transport; 0 = EVAL.TOP_K.
    # At SSD300 geometry the 200-row cap never binds (measured
    # dropped_dets 0, BENCH_NOTES round-3); at SSD512 (24,564 priors) a
    # trained model emits >200 conf>0.01 survivors on some images
    # (dropped 14/500 images in the r5 contract run) — widen the cap
    # instead of falling back to the dense tensor.
    C.EVAL.COMPACT_ROWS = 0

    return C


# module-level convenience instance (scripts); libraries should pass cfg explicitly
cfg = default_cfg()


def merge_cfg_from_file(cfg_filename, dst=None):
    """Load a YAML file and merge it into ``dst`` (default: module cfg)."""
    dst = cfg if dst is None else dst
    with open(cfg_filename, "r") as f:
        yaml_cfg = AttrDict(yaml.safe_load(f))
    _merge_a_into_b(yaml_cfg, dst)
    update_cfg(dst)
    return dst


def load_cfg(cfg_filename=None):
    """Fresh default tree, optionally overlaid with a YAML file."""
    c = default_cfg()
    if cfg_filename:
        merge_cfg_from_file(cfg_filename, dst=c)
    else:
        update_cfg(c)
    return c


def resolve_cfg_args(args):
    """Resolve the CLI's config path and run naming.

    With an explicit ``--cfg path``, cfg_name/job_group default to
    values derived from the yaml path (``cfgs/<group>/<name>.yml`` ->
    group/name) so such runs don't collide under the default cfg_name's
    weights/logs/history dirs — but an explicitly passed --cfg_name or
    --job_group (non-empty) always wins, so a user can point eval at a
    run directory named before this derivation existed. Without --cfg
    the path is built from cfg_name/job_group (the reference's
    setup_folder contract, lib/utils/utils.py:67-79). CLI parsers pass
    "" as the not-set sentinel. Mutates ``args`` in place and returns
    the cfg path.
    """
    import os.path as osp
    if getattr(args, "cfg", None):
        cfg_path = args.cfg
        if not getattr(args, "cfg_name", ""):
            args.cfg_name = osp.splitext(osp.basename(cfg_path))[0]
        if not getattr(args, "job_group", ""):
            parent = osp.basename(osp.dirname(osp.abspath(cfg_path)))
            args.job_group = (parent if parent and parent != "cfgs"
                              else "base")
        return cfg_path
    args.cfg_name = getattr(args, "cfg_name", "") or "ssd_vgg16_voc"
    args.job_group = getattr(args, "job_group", "") or "base"
    return osp.join("cfgs", args.job_group, args.cfg_name + ".yml")


def update_cfg(c=None):
    """Derived values (reference: lib/utils/config.py:183-186).

    DATASET_DIR is derived from ROOT_DIR/SUB_DIR only when the user did
    not set it explicitly (the reference silently clobbers an explicit
    value — acknowledged error-prone there, "TODO this is error prone").
    """
    c = cfg if c is None else c
    if not c.DATASET.DATASET_DIR:
        c.DATASET.DATASET_DIR = osp.abspath(
            osp.join(c.GENERAL.ROOT_DIR, "data", c.DATASET.SUB_DIR))
    c.MODEL.NUM_CLASSES = c.DATASET.NUM_CLASSES + 1  # + background
    c.MODEL.IMAGE_SIZE = c.DATASET.IMAGE_SIZE
    return c


def _merge_a_into_b(a, b, stack=None):
    """Merge AttrDict a into b; unknown keys are an error (strict overlay)."""
    assert isinstance(a, AttrDict) and isinstance(b, AttrDict)
    for k, v_ in a.items():
        full_key = ".".join(stack) + "." + k if stack is not None else k
        if k not in b:
            raise KeyError("Non-existent config key: {}".format(full_key))
        v = _decode_cfg_value(copy.deepcopy(v_))
        v = _coerce_cfg_value_type(v, b[k], full_key)
        if isinstance(v, AttrDict):
            _merge_a_into_b(v, b[k], stack=[k] if stack is None else stack + [k])
        else:
            b[k] = v


def _decode_cfg_value(v):
    if isinstance(v, dict):
        return AttrDict(v)
    if not isinstance(v, str):
        return v
    try:
        v = literal_eval(v)
    except (ValueError, SyntaxError):
        pass  # plain string
    return v


def _coerce_cfg_value_type(value_a, value_b, full_key):
    type_a, type_b = type(value_a), type(value_b)
    if type_a is type_b:
        return value_a
    if value_b is None:
        return value_a
    if isinstance(value_b, np.ndarray):
        return np.array(value_a, dtype=value_b.dtype)
    if isinstance(value_b, str):
        return str(value_a)
    if isinstance(value_a, tuple) and isinstance(value_b, list):
        return list(value_a)
    if isinstance(value_a, list) and isinstance(value_b, tuple):
        return tuple(value_a)
    if isinstance(value_a, int) and isinstance(value_b, float):
        return float(value_a)
    raise ValueError(
        "Type mismatch ({} vs. {}) with values ({} vs. {}) for config key: {}".format(
            type_b, type_a, value_b, value_a, full_key
        )
    )
