"""Training step: optimizer, LR schedule, jitted SPMD update.

Parity targets:
- SGD lr 1e-3 / momentum 0.9 / weight-decay 5e-4, step decay x0.1 at
  (80k, 100k) (reference lib/utils/config.py:148-172, train.py:96-98,
  216-224). Weight decay is applied to the gradient before the momentum
  buffer, matching torch.optim.SGD.
- loss = (loss_conf + LOC_WEIGHT * loss_loc) / N with N = total positive
  matches (multibox_loss.py:112-116) — here N is the *global* positive
  count: under a sharded batch the sums inside jit are global, so the
  normalization is exact regardless of device count (DataParallel
  averaged per-GPU losses instead).

The step is one jit over the mesh: batch sharded on 'data', params laid
out by odtpu.parallel.mesh.param_shardings; XLA inserts the gradient
all-reduce (ICI) and any tensor-parallel collectives.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..layers.losses import multibox_loss
from .mesh import (batch_sharding, image_sharding, param_shardings,
                   replicated)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any  # {} for BN-free models


def lr_schedule(cfg):
    """Step decay (+optional linear warmup).

    Warmup overlays the first WARMUP_ITERS steps without shifting the
    decay boundaries (optax.join_schedules would offset the second
    schedule's step count, moving every decay later by WARMUP_ITERS).
    """
    opt = cfg.TRAIN.OPTIMIZER
    sch = cfg.TRAIN.LR_SCHEDULER
    base = float(opt.LR)
    boundaries = {int(s): float(sch.GAMMA) for s in sch.STEPS
                  if int(s) < int(cfg.TRAIN.MAX_ITER)}
    decay = optax.piecewise_constant_schedule(base, boundaries)
    warm = int(sch.WARMUP_ITERS)
    if warm > 0:
        def sched(step):
            frac = jnp.clip(step / warm, 0.0, 1.0)
            warm_lr = base * (0.1 + 0.9 * frac)
            return jnp.where(step < warm, warm_lr, decay(step))
        return sched
    return decay


def _model_has_bn(cfg) -> bool:
    """Whether the configured model carries batch_stats (BatchNorm)."""
    return (bool(cfg.MODEL.BATCH_NORM)
            or cfg.MODEL.SSD_TYPE in ("FSSD", "RFBNet", "DRN_SSD")
            or str(cfg.MODEL.BASE).startswith("drn"))


def make_optimizer(cfg):
    opt = cfg.TRAIN.OPTIMIZER
    sched = lr_schedule(cfg)
    name = opt.OPTIMIZER.lower()
    clip = float(getattr(opt, "CLIP_GRAD_NORM", 0.0) or 0.0)
    pre = [optax.clip_by_global_norm(clip)] if clip > 0 else []
    if name == "sgd":
        tx = optax.chain(
            *pre,
            optax.add_decayed_weights(float(opt.WEIGHT_DECAY)),
            optax.sgd(sched, momentum=float(opt.MOMENTUM)),
        )
    elif name == "adam":
        tx = optax.chain(
            *pre,
            optax.add_decayed_weights(float(opt.WEIGHT_DECAY)),
            optax.adam(sched),
        )
    else:
        raise KeyError(f"unknown optimizer {name!r}")
    return tx, sched


def create_train_state(model, cfg, rng=None, mesh=None) -> tuple:
    """Init variables + optimizer state; placed on the mesh if given."""
    from ..models import init_model
    variables = init_model(model, cfg, rng=rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx, _ = make_optimizer(cfg)
    opt_state = tx.init(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, batch_stats=batch_stats)
    if mesh is not None:
        # the TP layout rule is purely shape-based (mesh.param_shardings),
        # so one uniform tree_map covers params, momentum buffers and
        # batch stats consistently — buffers mirror their param's layout.
        sh = param_shardings(state, mesh)
        state = jax.tree.map(jax.device_put, state, sh)
    return state, tx


def make_train_step(model, priors, cfg, tx, mesh=None, donate=True):
    """Returns step(state, images, boxes, labels) -> (state, metrics).

    NOTE: priors ride through jit as a real argument, never a closure —
    jit-captured device-array constants degrade the axon tunnel's
    host<->device transfer path by ~35x (measured; see SKILL.md gotchas).
    """
    variances = tuple(float(v) for v in cfg.MODEL.VARIANCE)
    overlap = float(cfg.LOSS.OVERLAP_THRESH)
    negpos = int(cfg.LOSS.NEG_POS_RATIO)
    loc_w = float(cfg.LOSS.LOC_WEIGHT)
    has_bn = _model_has_bn(cfg)
    is_refine = cfg.MODEL.SSD_TYPE == "RefineDet"
    odm_warm = int(cfg.LOSS.ODM_MATCH_WARM_ITERS)
    use_remat = bool(cfg.TPU.REMAT)
    device_photo = bool(cfg.DATASET.DEVICE_PHOTOMETRIC)
    photo_distort = bool(cfg.DATASET.PHOTOMETRIC)
    pixel_means = tuple(float(m) for m in cfg.DATASET.PIXEL_MEANS)
    rep_w = float(cfg.LOSS.REPULSION_WEIGHT)

    def apply_model(params, batch_stats, images, train):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
            out, mut = model.apply(variables, images, phase="train",
                                   train=train, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        out = model.apply(variables, images, phase="train", train=train)
        return out, batch_stats

    if use_remat:
        apply_model = jax.checkpoint(apply_model, static_argnums=(3,))

    def loss_fn(params, batch_stats, priors_arg, rng, step_i, images,
                boxes, labels):
        if device_photo:
            from ..data.device_aug import preprocess_train_batch
            images = preprocess_train_batch(images, rng, pixel_means,
                                            distort=photo_distort)
        outputs, new_stats = apply_model(params, batch_stats, images, True)
        if is_refine:
            from ..layers.losses import refinedet_loss
            arm_loc, arm_conf, odm_loc, odm_conf = outputs
            use_refined = True if odm_warm == 0 else (step_i >= odm_warm)
            r = refinedet_loss(arm_loc, arm_conf, odm_loc, odm_conf,
                               priors_arg, boxes, labels, variances,
                               overlap, negpos, use_refined=use_refined)
            n_arm = jnp.maximum(r.arm.num_pos, 1).astype(jnp.float32)
            n_odm = jnp.maximum(r.odm.num_pos, 1).astype(jnp.float32)
            loss_l = (loc_w * r.arm.loss_loc_sum / n_arm
                      + loc_w * r.odm.loss_loc_sum / n_odm)
            loss_c = (r.arm.loss_conf_sum / n_arm
                      + r.odm.loss_conf_sum / n_odm)
            loss = loss_l + loss_c
            metrics = {"loss": loss, "loss_loc": loss_l,
                       "loss_conf": loss_c, "num_pos": r.odm.num_pos}
            return loss, (metrics, new_stats)
        loc, conf = outputs
        out = multibox_loss(loc, conf, priors_arg, boxes, labels, variances,
                            overlap, negpos)
        n = jnp.maximum(out.num_pos, 1).astype(jnp.float32)
        loss_l = out.loss_loc_sum / n
        loss_c = out.loss_conf_sum / n
        loss = loc_w * loss_l + loss_c
        metrics = {"loss": loss, "loss_loc": loss_l, "loss_conf": loss_c,
                   "num_pos": out.num_pos}
        if rep_w > 0:
            from ..layers.losses import repulsion_loss
            rep_sum, rep_n = repulsion_loss(loc, priors_arg, boxes, labels,
                                            variances)
            loss_rep = rep_sum / jnp.maximum(rep_n, 1).astype(jnp.float32)
            loss = loss + rep_w * loss_rep
            metrics["loss"] = loss
            metrics["loss_repul"] = loss_rep
        return loss, (metrics, new_stats)

    def step(state: TrainState, priors_arg, images, boxes, labels):
        rng = jax.random.fold_in(jax.random.PRNGKey(17),
                                 state.step.astype(jnp.uint32))
        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, priors_arg, rng, state.step,
            images, boxes, labels)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, batch_stats=new_stats)
        return new_state, metrics

    if mesh is None:
        jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
        priors_dev = jax.device_put(jnp.asarray(priors))
    else:
        b_sh = batch_sharding(mesh)
        jitted = jax.jit(
            step,
            in_shardings=(None, replicated(mesh), image_sharding(mesh),
                          b_sh, b_sh),
            donate_argnums=(0,) if donate else (),
        )
        priors_dev = jax.device_put(jnp.asarray(priors), replicated(mesh))

    def wrapped(state, images, boxes, labels):
        return jitted(state, priors_dev, images, boxes, labels)

    # benchmark/profiling tools re-jit the step inside a chained
    # fori_loop; give them the unjitted step + committed priors so
    # priors ride as a loop-invariant ARGUMENT (a closure-captured
    # device array inside an outer jit re-introduces the tunnel
    # degradation documented in the module docstring)
    wrapped.raw_step = step
    wrapped.priors = priors_dev
    return wrapped


def make_eval_step(model, priors, cfg, mesh=None, compact=None):
    """Jitted eval forward + on-chip decode/NMS.

    compact=True returns {"rows": [B, top_k, 6] cross-class rows,
    "dropped": [B] int32 count of per-class NMS survivors the cross-class
    top-k cap discarded} — a tiny device->host copy, *self-auditing*: the
    reference's eval returns every per-class survivor (its global filter
    at detection.py:60-63 is a no-op), so any nonzero "dropped" marks a
    potential mAP-relevant deviation and the evaluator surfaces it.
    compact=False returns the dense reference-contract tensor
    [B, C, top_k, 5]. Default (None) reads cfg.EVAL.COMPACT."""
    from ..ops.detect import detect_out, detect_refine
    from ..ops.detect import _compact as compact_rows
    variances = tuple(float(v) for v in cfg.MODEL.VARIANCE)
    top_k = int(cfg.EVAL.TOP_K)
    conf_thresh = float(cfg.EVAL.CONF_THRESH)
    nms_thresh = float(cfg.EVAL.NMS_THRESH)
    has_bn = _model_has_bn(cfg)
    is_refine = cfg.MODEL.SSD_TYPE == "RefineDet"
    if compact is None:
        compact = bool(cfg.EVAL.COMPACT)
    # int8 serving mode: the context is entered INSIDE the step so it is
    # active whenever jit traces it (models/common.py `quantized`); the
    # mode is closed over per-builder, so steps with different modes are
    # distinct function objects and can't share a trace.
    quant = str(cfg.TPU.QUANT or "")

    pixel_means = tuple(float(m) for m in cfg.DATASET.PIXEL_MEANS)

    def step(params, batch_stats, priors_arg, images):
        if images.dtype == jnp.uint8:
            # device-side normalization (exact reference math: u8 resize
            # then f32 mean subtract, then BGR->RGB — det_dataset.py:49)
            images = images.astype(jnp.float32) \
                - jnp.asarray(pixel_means, jnp.float32)
            images = images[..., ::-1]
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
        from ..models.common import quantized
        with quantized(quant):
            out = model.apply(variables, images, phase="eval", train=False)
        # under compact, skip the per-class survivors-first partition:
        # compact_rows re-ranks cross-class by score (bit-identical
        # rows — see detect_out_compact), and the self-audit's
        # score>0 counts don't depend on row order either
        if is_refine:
            arm_loc, arm_conf, odm_loc, odm_conf = out
            dense = detect_refine(arm_loc, arm_conf, odm_loc, odm_conf,
                                  priors_arg, variances, conf_thresh,
                                  nms_thresh, top_k, compact=False,
                                  row_compact=not compact)
        else:
            loc, conf = out
            dense = detect_out(loc, conf, priors_arg, variances,
                               conf_thresh, nms_thresh, top_k,
                               row_compact=not compact)
        if not compact:
            return dense
        # cross-class row budget: EVAL.COMPACT_ROWS widens the transport
        # where the TOP_K cap measurably binds (SSD512 geometry) while
        # keeping the D2H copy tiny; 0 = TOP_K (SSD300 never binds it)
        rows_cap = int(cfg.EVAL.COMPACT_ROWS) or top_k
        rows = compact_rows(dense, rows_cap)
        n_dense = jnp.sum(dense[..., 0] > 0, axis=(1, 2), dtype=jnp.int32)
        n_kept = jnp.sum(rows[..., 0] > 0, axis=1, dtype=jnp.int32)
        return {"rows": rows, "dropped": n_dense - n_kept}

    # priors as a jit *argument*, not a closure (see make_train_step note)
    multiproc = mesh is not None and jax.process_count() > 1
    if mesh is None or multiproc:
        # Multi-process: each host evaluates its loader slice on its
        # LOCAL devices (the eval loader shards the index space; rows
        # are all-gathered at the end — odtpu/data/__init__.py,
        # evaluator._gather_multihost). A global-mesh jit cannot
        # consume the host-local numpy batches validate() feeds it, so
        # eval runs unsharded per host. Params arrive committed to the
        # global mesh; localize them once per distinct params tree (a
        # per-batch device_get would dominate the loop).
        if multiproc:
            assert mesh.shape.get("model", 1) == 1, (
                "multi-process eval requires MESH_MODEL=1 (a TP-sharded "
                "model cannot be evaluated host-locally)")
        jitted = jax.jit(step)
        priors_dev = jax.device_put(jnp.asarray(priors))
        # one cache slot PER ARGUMENT POSITION, each holding a strong
        # reference to the source tree it was localized from: a single
        # id()-keyed slot consulted alternately for params and
        # batch_stats would flip every call (re-transferring the full
        # param tree per batch), and a bare id() with no retained
        # reference can alias a new tree after GC and serve stale
        # weights across successive validate() calls.
        cache = [None, None]  # [(source_tree, localized_tree), ...]

        def localize(tree, slot):
            if not multiproc or tree is None:
                return tree
            ent = cache[slot]
            if ent is None or ent[0] is not tree:
                local = jax.tree.map(
                    lambda x: jax.device_put(np.asarray(jax.device_get(x)))
                    if isinstance(x, jax.Array) else x, tree)
                cache[slot] = ent = (tree, local)
            return ent[1]

        def wrapped(params, batch_stats, images):
            return jitted(localize(params, 0), localize(batch_stats, 1),
                          priors_dev, images)

        wrapped.raw_step = step
        wrapped.priors = priors_dev
        return wrapped

    b_sh = batch_sharding(mesh)
    jitted = jax.jit(step,
                     in_shardings=(None, None, replicated(mesh),
                                   image_sharding(mesh)),
                     out_shardings=b_sh)
    priors_dev = jax.device_put(jnp.asarray(priors), replicated(mesh))

    def wrapped(params, batch_stats, images):
        return jitted(params, batch_stats, priors_dev, images)

    wrapped.raw_step = step
    wrapped.priors = priors_dev
    return wrapped
