"""Device mesh construction and sharding specs.

The reference's only parallelism is single-node nn.DataParallel replication
(edgeconnect/models.py:63-65). The TPU-native runtime replaces that with a
`jax.sharding.Mesh` over ICI and named-axis shardings consumed by jit — XLA inserts
the collectives. Axes:

* ``data``  — batch / vehicles / steps (pure data parallelism; gradient psum);
* ``model`` — channel (tensor) parallelism for the CNN generators: conv kernels shard
  their output-channel axis, activations shard their channel axis, and XLA turns the
  channel-sharded convolutions into all-gather/reduce-scatter pairs over ICI.

Multi-host (DCN) initialization is a thin wrapper over jax.distributed.initialize.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, context: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model[, context]) mesh. data=-1 uses all remaining devices.

    The 'context' axis has no referent in the reference (every network is a CNN on
    256² crops — SURVEY §5), but the runtime reserves it for sequence/context
    parallelism of future attention-based generators; with context=1 the mesh stays
    2-axis for backward compatibility.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    per_replica = model * context
    if data == -1:
        if n % per_replica:
            raise ValueError(f"{n} devices not divisible by model*context={per_replica}")
        data = n // per_replica
    if data * per_replica > n:
        raise ValueError(f"mesh {data}x{model}x{context} exceeds {n} devices")
    if context > 1:
        dev_array = np.asarray(devices[: data * per_replica]).reshape(data, model, context)
        return Mesh(dev_array, axis_names=("data", "model", "context"))
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def init_distributed(coordinator_address: Optional[str] = None, **kwargs):
    """Multi-host (DCN) initialization; no-op when already initialized or when no
    coordinator is given (explicit single-host).

    Ordering contract: ``jax.distributed.initialize`` must run BEFORE any call
    that touches a backend (``jax.devices()``/``jax.process_count()`` would
    initialize a single-process local backend first, after which initialize is
    too late). This function therefore only consults
    ``jax.distributed.is_initialized()`` — which reads client state without
    initializing a backend — and never queries devices/process counts itself.
    """
    if coordinator_address is None and not kwargs:
        return
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for image batches (B, H, W, C)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_conv_kernel(path: Tuple, leaf) -> bool:
    names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
    return leaf.ndim == 4 and ("kernel" in names or "v" in names)


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel sharding rules for a flax param tree.

    Conv kernels (HWIO) and weight-norm ``v`` shard the output-channel axis over
    'model' when divisible; per-channel vectors (bias, g, gamma, beta) shard likewise;
    everything else is replicated. With model=1 this degrades to pure replication.
    """
    model_size = mesh.shape["model"]

    def rule(path, leaf):
        if model_size > 1:
            if _is_conv_kernel(path, leaf) and leaf.shape[-1] % model_size == 0:
                return NamedSharding(mesh, P(None, None, None, "model"))
            if leaf.ndim == 1 and leaf.shape[0] % model_size == 0 and leaf.shape[0] >= 64:
                return NamedSharding(mesh, P("model"))
            if leaf.ndim == 2 and leaf.shape[-1] % model_size == 0 and leaf.shape[-1] >= 64:
                return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to :func:`param_shardings`."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
