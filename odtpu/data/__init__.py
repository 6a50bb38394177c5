"""Dataset factory (parity: /root/reference/lib/datasets/__init__.py:12)."""

from __future__ import annotations

from .augment import SSDAugmentation
from .coco import COCODetection
from .loader import DetLoader, pad_batch_to
from .voc import VOC_CLASSES, VOCDetection, parse_voc_xml

__all__ = ["SSDAugmentation", "COCODetection", "DetLoader", "pad_batch_to",
           "VOC_CLASSES", "VOCDetection", "parse_voc_xml",
           "dataset_factory"]


def dataset_factory(phase, cfg):
    """phase 'train' -> shuffled loader with full augmentation, drop_last;
    phase 'eval' -> ordered loader with resize+mean only."""
    name = cfg.DATASET.NAME.upper()
    train = phase == "train"
    sets = cfg.DATASET.TRAIN_SETS if train else cfg.DATASET.TEST_SETS
    image_cache = None
    if bool(cfg.DATASET.CACHE_IMAGES):
        # one budget per dataset root, shared by the train and eval
        # loaders of the run (overlapping splits de-duplicate)
        from .cache import shared_cache
        image_cache = shared_cache(cfg.DATASET.DATASET_DIR,
                                   float(cfg.DATASET.CACHE_GB))
    if name.startswith("VOC"):
        dataset = VOCDetection(cfg.DATASET.DATASET_DIR, sets,
                               image_cache=image_cache)
    elif name.startswith("COCO"):
        dataset = COCODetection(cfg.DATASET.DATASET_DIR, sets,
                                image_cache=image_cache)
    else:
        raise KeyError("unknown dataset {!r}".format(cfg.DATASET.NAME))
    transform = SSDAugmentation(
        cfg.DATASET.IMAGE_SIZE, cfg.DATASET.PIXEL_MEANS,
        use_base=not train,
        device_photometric=train and bool(cfg.DATASET.DEVICE_PHOTOMETRIC),
        device_normalize=not train,
        photometric=bool(cfg.DATASET.PHOTOMETRIC))
    num_pics = 0 if train else int(cfg.DATASET.NUM_EVAL_PICS)
    # multi-host: each process loads its slice and its share of the
    # global batch (jax.distributed must be initialized by the caller)
    import jax
    world = jax.process_count()
    rank = jax.process_index()
    batch = (cfg.DATASET.TRAIN_BATCH_SIZE if train
             else cfg.DATASET.EVAL_BATCH_SIZE)
    if train and world > 1:
        assert batch % world == 0, "global batch must divide process count"
        batch //= world
    # eval is sharded too: each host evaluates its 1/world slice with
    # local devices (no collectives in the loop) and detection rows are
    # all-gathered at the end (evaluator.py, allgather_host_rows) —
    # round 1 had every host redundantly evaluating the full test set
    loader = DetLoader(
        dataset, transform,
        batch_size=batch,
        max_boxes=int(cfg.DATASET.MAX_BOXES),
        shuffle=train, drop_last=train,
        num_workers=int(cfg.DATASET.NUM_WORKERS),
        num_pics=num_pics,
        shard=(rank, world))
    return loader
