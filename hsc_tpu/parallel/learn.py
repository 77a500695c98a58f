"""Distributed dictionary learning step — SURVEY.md §2.3 P8.

Each shard accumulates (assignment sums, counts, objective) over its local
windows; one `psum` over the mesh axis; the normalize-update then runs
identically on every replica — bit-identical dictionaries everywhere with no
parameter server.  This is the sharded counterpart of
`hsc/modeling.py :: ConvolutionalDictionaryLearner.train`'s k-means loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..learn.kmeans import kmeans_assign_update, normalize_centroids


def distributed_kmeans_step(
    mesh: Mesh, windows: jax.Array, centroids: jax.Array, axis: str = "data"
):
    """One sharded refinement step.

    `windows [M, D]` sharded over `axis`; `centroids [K, D]` replicated.
    Returns (new_centroids [K, D] replicated, objective scalar).
    """

    def step(w, c):
        stats = kmeans_assign_update(w, c)
        sums = jax.lax.psum(stats.sums, axis)
        counts = jax.lax.psum(stats.counts, axis)
        obj = jax.lax.psum(stats.objective, axis)
        return normalize_centroids(sums, counts, c), obj

    fn = jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(axis, None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return fn(windows, centroids)


def distributed_kmeans(
    mesh: Mesh,
    windows: jax.Array,
    centroids0: jax.Array,
    iterations: int,
    axis: str = "data",
):
    """Full sharded k-means refinement; returns (centroids, objective_history)."""
    c = jnp.asarray(centroids0)
    history = []
    for _ in range(iterations):
        c, obj = distributed_kmeans_step(mesh, windows, c, axis=axis)
        history.append(float(obj))
    return c, history
