"""Device mesh + sharding layout.

The reference's entire parallelism story is one line of
torch.nn.DataParallel (train.py:62). The TPU-native equivalent is a
jax.sharding.Mesh with a 'data' axis (batch-sharded inputs, replicated
params, XLA-inserted gradient all-reduce over ICI) plus an optional
'model' axis for tensor parallelism: wide conv kernels are sharded over
output channels and GSPMD propagates the sharding through the network,
turning the channel-contracting convs into partial-sum + reduce —
no hand-written collectives anywhere, matching the reference's
"zero comms code" shape (SURVEY §2.6). A third optional 'spatial' axis
shards the image H dimension (GSPMD spatial partitioning, halo
exchanges inserted by XLA at every conv) for the large-image /
small-batch regime where batch parallelism alone can't fill a slice —
beyond-reference (the torch code has no equivalent).

Multi-host: call jax.distributed.initialize() before make_mesh and the
same code spans slices (DCN between hosts, ICI within).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, devices=None, data=None, model=None,
              spatial=None) -> Mesh:
    """Build a (data, model, spatial) mesh. data=-1 (default) consumes
    all devices left after the model and spatial axes. The spatial axis
    shards the image H dimension (GSPMD spatial partitioning — XLA
    inserts conv halo exchanges); size 1 (the default) makes it inert.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if cfg is not None:
        model = cfg.TPU.MESH_MODEL if model is None else model
        data = cfg.TPU.MESH_DATA if data is None else data
        spatial = (cfg.TPU.get("MESH_SPATIAL", 1) if spatial is None
                   else spatial)
    model = 1 if model in (None, -1) else int(model)
    spatial = 1 if spatial in (None, -1) else int(spatial)
    n = len(devices)
    if data in (None, -1):
        data = n // (model * spatial)
    need = data * model * spatial
    if need > n:
        raise ValueError(f"mesh {data}x{model}x{spatial} needs {need} "
                         f"devices, have {n}")
    dev_array = np.asarray(devices[:need]).reshape(data, model, spatial)
    return Mesh(dev_array, ("data", "model", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image batches: batch over 'data', H over 'spatial' (inert
    when the spatial axis is size 1)."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# minimum output-channel width worth sharding over the model axis
_TP_MIN_CHANNELS = 512


def param_shardings(params, mesh: Mesh):
    """PyTree of NamedShardings for model params.

    Conv kernels (HWIO) with wide output channels are sharded over
    'model'; their biases follow; everything else is replicated. With
    MESH_MODEL=1 this degrades to fully-replicated data parallelism.
    """
    tp = mesh.shape["model"]

    def rule(path, leaf):
        if tp > 1 and hasattr(leaf, "shape") and leaf.ndim >= 1:
            out_ch = leaf.shape[-1]
            if out_ch >= _TP_MIN_CHANNELS and out_ch % tp == 0:
                if leaf.ndim == 4:  # conv kernel HWIO
                    return NamedSharding(mesh, P(None, None, None, "model"))
                if leaf.ndim == 1:  # bias / scale
                    return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh according to param_shardings."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (leading batch dim) onto the data axis.

    Single-process: a plain device_put with the batch sharding.
    Multi-host: each process holds its LOCAL rows (dataset_factory
    shards the index space), so the global array must be assembled with
    make_array_from_process_local_data — device_put would treat the
    local batch as the global value.
    """
    s_rows = batch_sharding(mesh)
    s_img = image_sharding(mesh)

    def spec(x):
        # NHWC image batches additionally shard H over 'spatial'; every
        # other leaf (boxes/labels/targets) is batch-sharded only
        return s_img if getattr(x, "ndim", 0) >= 4 else s_rows

    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                spec(np.asarray(x)), np.asarray(x)), batch)
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), spec(x)), batch)
