"""Device mesh + sharding layout for multi-chip scaling.

The reference is a single-GPU/CPU tool with no collective communication
(SURVEY.md 2.9); here multi-chip scaling is a first-class but thin layer:
a (data, model) mesh where

- batches are sharded over the 'data' axis (pure data parallelism — the
  natural axis for this workload: decoding/training scales in lines),
- the wide parameter matrices (embedding, LSTM gate kernels, attention
  projections) are sharded over the 'model' axis (tensor parallelism for
  large widths); XLA GSPMD inserts the all-gather/psum collectives.

Single-chip is just the 1x1 mesh; all entry points degrade gracefully.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, data_axis=None):
    """Create a ('data', 'model') mesh over the first n devices.

    `data_axis` fixes the data-parallel degree; by default all devices
    go to data parallelism (this workload scales in lines, module
    docstring) except at 4+ even devices, where a 2-way model axis is
    carved out for width-512+ tensor parallelism.
    """
    available = jax.devices()
    if n_devices:
        if n_devices < 0 or n_devices > len(available):
            # silently truncating would let a user believe they run on
            # more chips than exist (pass None/0 for "all devices")
            raise ValueError(
                'requested %d mesh devices but %d are available'
                % (n_devices, len(available)))
        devices = available[:n_devices]
    else:
        devices = available
    n = len(devices)
    if data_axis is None:
        model = 2 if n % 2 == 0 and n >= 4 else 1
        data_axis = n // model
    if n % data_axis:
        raise ValueError(
            'data_axis %d does not divide the %d available devices'
            % (data_axis, n))
    model = n // data_axis
    mesh_devices = np.array(devices).reshape(data_axis, model)
    return Mesh(mesh_devices, ('data', 'model'))


def param_sharding(params, mesh):
    """NamedSharding pytree for the model parameters: wide matmul
    operands sharded over 'model', small vectors replicated."""
    nmodel = mesh.shape['model']

    def spec_for(path, leaf):
        if leaf.ndim >= 2 and leaf.shape[-1] % nmodel == 0 \
                and leaf.shape[-1] >= nmodel * 8:
            # (in, 4W) gate kernels, (V, W) embedding, (A, W)/(W, W)
            # projections: shard the wide output axis
            return P(*([None] * (leaf.ndim - 1) + ['model']))
        if leaf.ndim == 1 and leaf.shape[0] >= 128 \
                and leaf.shape[0] % nmodel == 0:
            return P('model')
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)),
        params)


def batch_sharding(mesh, ndim=3):
    """Shard the leading batch axis over 'data'."""
    return NamedSharding(mesh, P(*(['data'] + [None] * (ndim - 1))))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_params(params, mesh):
    return jax.device_put(params, param_sharding(params, mesh))


def shard_batch(arrays, mesh):
    return tuple(jax.device_put(a, batch_sharding(mesh, np.ndim(a)))
                 for a in arrays)
