"""Data-parallel block encoding — the primary scaling strategy (SURVEY.md
§2.3 P1): signal blocks sharded over the 'data' mesh axis, dictionaries
replicated, per-block greedy MP fully independent, bitstreams gathered on the
host in original block order."""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.coder import ConvolutionalMatchingPursuit
from ..ops.encode import EncodedBlock, mp_encode_jax


class DataParallelEncoder:
    """Shards a batch of blocks across `mesh` axis 'data' and runs the batched
    greedy MP under one pjit; results come back in original block order
    (deterministic gather — SURVEY.md §2.3 P9)."""

    def __init__(self, mesh: Mesh, mp: ConvolutionalMatchingPursuit, axis: str = "data"):
        self.mesh = mesh
        self.mp = mp
        self.axis = axis
        self._data_sharding = NamedSharding(mesh, P(axis, None, None))
        self._repl = NamedSharding(mesh, P())
        fn = jax.vmap(
            functools.partial(mp_encode_jax, **mp.settings), in_axes=(0, None, None)
        )
        out_sharding = EncodedBlock(
            positions=NamedSharding(mesh, P(axis, None)),
            atoms=NamedSharding(mesh, P(axis, None)),
            codes=NamedSharding(mesh, P(axis, None)),
            count=NamedSharding(mesh, P(axis)),
            scale=NamedSharding(mesh, P(axis)),
            energy0=NamedSharding(mesh, P(axis)),
            energy_res=NamedSharding(mesh, P(axis)),
        )
        self._fn = jax.jit(
            fn,
            in_shardings=(self._data_sharding, self._repl, self._repl),
            out_shardings=out_sharding,
        )

    @property
    def num_shards(self) -> int:
        return int(self.mesh.shape[self.axis])

    def pad_batch(self, xs: np.ndarray) -> tuple[np.ndarray, int]:
        """Pad block count to a multiple of the shard count (zero blocks
        encode to empty streams and are dropped after gather)."""
        b = xs.shape[0]
        s = self.num_shards
        pad = (-b) % s
        if pad:
            xs = np.concatenate([xs, np.zeros((pad,) + xs.shape[1:], xs.dtype)])
        return xs, b

    def encode(self, xs: np.ndarray) -> EncodedBlock:
        """Encode ``[B, N]`` (or ``[B, N, C]``) blocks; B padded to shards."""
        xs = np.asarray(xs, dtype=np.float32)
        if xs.ndim == 2:
            xs = xs[:, :, None]
        padded, b = self.pad_batch(xs)
        arr = jax.device_put(jnp.asarray(padded), self._data_sharding)
        enc = self._fn(arr, self.mp.bank, self.mp.gram_t)
        host = jax.device_get(enc)  # gathers shards in block order
        return EncodedBlock(*(np.asarray(v)[:b] for v in host))

    def encode_multihost(self, local_blocks: np.ndarray, n_global: int) -> EncodedBlock:
        """Multi-host SPMD encode (SURVEY.md §2.3 P9): every process passes
        its host-local slice of the corpus (deterministic block->host
        assignment: process p owns blocks [p*n_local, (p+1)*n_local)); the
        padded results are allgathered so every host sees the full corpus in
        original block order (process 0 packs the container).

        Single-process this degenerates to `encode`.
        """
        local_blocks = np.asarray(local_blocks, dtype=np.float32)
        if local_blocks.ndim == 2:
            local_blocks = local_blocks[:, :, None]
        if jax.process_count() == 1:
            return self.encode(local_blocks[:n_global])
        from jax.experimental import multihost_utils

        arr = jax.make_array_from_process_local_data(
            self._data_sharding, local_blocks
        )
        enc = self._fn(arr, self.mp.bank, self.mp.gram_t)
        host = multihost_utils.process_allgather(enc, tiled=True)
        return EncodedBlock(*(np.asarray(v)[:n_global] for v in host))
