"""Checkpoint / resume via orbax.

Parity target: the reference's torch.save dicts {'iteration',
'step_index', 'state_dict'} every SAVE_ITER (train.py:161-169,211-213)
and --resume restore (train.py:67-72). Here the checkpoint carries the
whole TrainState (params + momentum + step) so LR-schedule state resumes
exactly (the schedule is a pure function of step — no fragile
step_index bookkeeping).

Also: one-time import of converted backbone weights from an .npz
(replaces the reference's vgg16_reducedfc.pth partial-state-dict load,
train.py:75-85). Conversion script: tools/convert_torch_weights.py.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Optional

import jax
import numpy as np


def _manager(directory, max_to_keep=5):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        osp.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


class Checkpointer:
    def __init__(self, directory, max_to_keep: int = 5):
        self.directory = osp.abspath(directory)
        self.mgr = _manager(directory, max_to_keep)

    def save(self, step: int, state: Any, force: bool = False):
        import orbax.checkpoint as ocp
        step = int(step)
        if step in (self.mgr.all_steps() or []):
            if not force:
                return  # already saved at this step (e.g. save+final)
            self.mgr.delete(step)
        state = jax.tree.map(np.asarray, jax.device_get(state))
        self.mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None,
                partial: bool = False) -> Any:
        """Restore into `template`'s structure. With partial=True the
        template may omit whole subtrees (e.g. opt_state for eval-time
        loads) — omitted entries are skipped on disk, so a checkpoint
        written with a different optimizer chain still restores."""
        import orbax.checkpoint as ocp
        step = self.latest_step() if step is None else int(step)
        if step is None:
            raise FileNotFoundError(
                "no checkpoint found under " + self.directory)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
            if hasattr(x, "dtype") else x, template)
        if partial:
            return self.mgr.restore(
                step, args=ocp.args.PyTreeRestore(item=abstract,
                                                  partial_restore=True))
        return self.mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def restore_partial(ckpt_dir, params, batch_stats=None, step=None):
    """Partial restore of the eval-relevant TrainState fields against
    host templates — the ONE place that defines the on-disk layout of a
    step/params/batch_stats subset restore (eval.py and
    restore_eval_variables both speak this protocol; restoring the full
    TrainState instead would tie eval to the saving run's optimizer
    chain). Returns ``(step, params, batch_stats_or_None)``.
    """
    template = {"step": np.zeros((), np.int32), "params": params}
    if batch_stats:
        template["batch_stats"] = batch_stats
    restored = Checkpointer(ckpt_dir).restore(template, step=step,
                                              partial=True)
    return (restored["step"], restored["params"],
            restored.get("batch_stats") or None)


def restore_eval_variables(model, cfg, path="", step=None):
    """Eval-time weight resolution shared by the demos and the serving
    endpoint: `path` may be an orbax checkpoint directory, a converted
    model `.npz` (tools/convert_torch_weights.py --mode ssd — i.e. a
    reference-trained .pth), or empty (random init + warning).

    Returns a flax variables dict {"params": ..., ["batch_stats": ...]}.
    """
    import os.path as osp

    from ..models import init_model
    variables = init_model(model, cfg)
    if path and osp.isfile(path) and path.endswith(".npz"):
        variables, loaded, skipped = load_variables_npz(variables, path)
        if not loaded:
            # every key mismatched: almost certainly an .npz converted
            # for a different model family — serving random init while
            # claiming this checkpoint would be silent garbage
            raise ValueError(
                "no tensor in {!r} matched the {} model's param tree "
                "({} keys skipped); was it converted for a different "
                "MODEL.SSD_TYPE/BASE?".format(
                    path, cfg.MODEL.SSD_TYPE, len(skipped)))
        print("model npz import: {} loaded, {} skipped".format(
            len(loaded), len(skipped)))
    elif path and osp.isfile(path):
        raise ValueError(
            "{!r} is a file but not a .npz — torch .pth checkpoints "
            "must be converted first: tools/convert_torch_weights.py "
            "--mode ssd <pth> <npz>".format(path))
    elif path and not osp.isdir(path):
        raise FileNotFoundError(
            "checkpoint path {!r} does not exist".format(path))
    elif path and osp.isdir(path):
        # partial restore: eval needs params/batch_stats/step only —
        # omitting opt_state also makes eval independent of the saving
        # run's optimizer chain (a checkpoint written with grad-clip on
        # previously failed to restore against a clipless template)
        step, params, batch_stats = restore_partial(
            path, variables["params"], variables.get("batch_stats"),
            step=step)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        print("restored checkpoint step", int(np.asarray(step)))
    else:
        print("WARNING: no checkpoint at {!r}; using random init"
              .format(path))
    return variables


# ckpt_to_npz.py carries BN running stats under this reserved key
# namespace; load_model_npz (params-only consumers, e.g. --basenet
# trunk transfer) ignores it, load_variables_npz restores it.
BATCH_STATS_PREFIX = "__batch_stats__/"


def load_model_npz(params, npz_path):
    """Merge a full converted model checkpoint into a param tree.

    npz keys are '/'-joined odtpu param paths (as produced by
    tools/convert_torch_weights.py --mode ssd). Missing/mismatched keys
    are left at init (the reference's partial-state-dict fallback,
    train.py:79-85). Returns (new_params, loaded_paths, skipped_paths).
    """
    import flax
    data = np.load(npz_path)
    flat = flax.traverse_util.flatten_dict(params)
    loaded, skipped = [], []
    for key in data.files:
        if key.startswith(BATCH_STATS_PREFIX):
            continue  # not a param; see load_variables_npz
        path = tuple(key.split("/"))
        if path in flat and flat[path].shape == data[key].shape:
            flat[path] = data[key].astype(flat[path].dtype)
            loaded.append(key)
        else:
            skipped.append(key)
    return flax.traverse_util.unflatten_dict(flat), loaded, skipped


def load_variables_npz(variables, npz_path):
    """Restore an eval-time variables dict from a ckpt_to_npz export:
    params by '/'-joined path plus BN batch_stats carried under the
    BATCH_STATS_PREFIX namespace (BN-heavy families — RFBNet / FSSD /
    DRN — are not reproducible from params alone; init running stats
    give garbage eval). Returns (variables, loaded, skipped)."""
    import flax
    params, loaded, skipped = load_model_npz(variables["params"], npz_path)
    out = dict(variables, params=params)
    if "batch_stats" in variables:
        data = np.load(npz_path)
        flat = flax.traverse_util.flatten_dict(variables["batch_stats"])
        for key in data.files:
            if not key.startswith(BATCH_STATS_PREFIX):
                continue
            path = tuple(key[len(BATCH_STATS_PREFIX):].split("/"))
            if path in flat and flat[path].shape == data[key].shape:
                flat[path] = data[key].astype(flat[path].dtype)
                loaded.append(key)
            else:
                skipped.append(key)
        out["batch_stats"] = flax.traverse_util.unflatten_dict(flat)
    return out, loaded, skipped


def load_backbone_npz(params, npz_path, backbone_key="backbone"):
    """Merge converted backbone weights into a param tree.

    npz keys: '<conv_name>/kernel' (HWIO), '<conv_name>/bias'. Missing
    keys are left at init (partial-load fallback, reference
    train.py:79-85). Returns (new_params, loaded_names, skipped_names).
    """
    import flax
    data = np.load(npz_path)
    flat = flax.traverse_util.flatten_dict(params)
    loaded, skipped = [], []
    by_conv = {}
    for key in data.files:
        name, leaf = key.rsplit("/", 1)
        by_conv.setdefault(name, {})[leaf] = data[key]
    for name, leaves in by_conv.items():
        for leaf, value in leaves.items():
            path = (backbone_key, name, "conv", leaf)
            if path in flat and flat[path].shape == value.shape:
                flat[path] = value.astype(flat[path].dtype)
                loaded.append(name + "/" + leaf)
            else:
                skipped.append(name + "/" + leaf)
    return flax.traverse_util.unflatten_dict(flat), loaded, skipped
