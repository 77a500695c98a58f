"""Device-side decode: overlap-add reconstruction in stream order.

The bit-exactness surface (`hsc/modeling.py :: ConvolutionalSparseCoder
.reconstruct`, SURVEY.md §3.4): each event adds ``c_hat * bank[f]`` at its
position, sequentially in stream order — the same two float32 IEEE ops per
sample as the NumPy oracle (`hsc_tpu.oracle.mp.mp_decode`), so reconstruction
bytes are identical across backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n",))
def mp_decode_jax(
    positions: jax.Array,
    atoms: jax.Array,
    codes: jax.Array,
    count: jax.Array,
    scale: jax.Array,
    bank: jax.Array,
    *,
    n: int,
) -> jax.Array:
    """Reconstruct ``[N, C]`` from a (padded) event stream.

    `positions/atoms/codes` are the fixed-size buffers from `mp_encode_jax`
    (or unpacked from a bitstream and padded); only the first `count` events
    contribute.
    """
    k, w, c = bank.shape
    amps = codes.astype(jnp.float32) * scale.astype(jnp.float32)
    m = positions.shape[0]
    mask = jnp.arange(m) < count
    # Spec arithmetic is multiply-round-add-round.  The products are
    # materialized *before* the scan: XLA cannot fuse producers into a
    # while-loop body, so the adds inside the loop stay plain fp32 adds (an
    # in-body multiply would get FMA-contracted — single rounding — and flip
    # low bits vs the NumPy oracle).
    prods = jnp.where(mask, amps, jnp.float32(0))[:, None, None] * bank[atoms]

    def body(out, i):
        patch = jax.lax.dynamic_slice(out, (positions[i], 0), (w, c))
        out = jax.lax.dynamic_update_slice(out, patch + prods[i], (positions[i], 0))
        return out, None

    out0 = jnp.zeros((n, c), dtype=jnp.float32)
    out, _ = jax.lax.scan(body, out0, jnp.arange(m))
    return out


@functools.partial(jax.jit, static_argnames=("n",))
def mp_decode_batch_jax(
    positions: jax.Array,  # [B, M] i32
    atoms: jax.Array,  # [B, M] i32
    codes: jax.Array,  # [B, M] i32
    count: jax.Array,  # [B] i32
    scale: jax.Array,  # [B] f32
    bank: jax.Array,  # [K, W, C]
    *,
    n: int,
) -> jax.Array:
    """Batched decode ``-> [B, N, C]`` — one jit'd vmap over blocks, same
    stream-order bitwise contract per block as `mp_decode_jax`."""
    return jax.vmap(
        lambda p, a, cd, ct, sc: mp_decode_jax(p, a, cd, ct, sc, bank, n=n)
    )(positions, atoms, codes, count, scale)
