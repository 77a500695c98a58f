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


def _planes6(x: jax.Array, nplanes: int) -> list[jax.Array]:
    """Arithmetic base-64 decomposition ``x = sum_j planes[j] << 6j``.

    Low planes land in [0, 63], the top plane in [-64, 63] — every plane is
    exactly representable in bfloat16 (8-bit mantissa), which is what makes
    the MXU plane matmuls error-free."""
    out = []
    cur = x
    for _ in range(nplanes - 1):
        hi = cur >> 6  # arithmetic shift == floor division
        out.append(cur - (hi << 6))
        cur = hi
    out.append(cur)
    return out


@functools.partial(jax.jit, static_argnames=("n",))
def mp_decode_integer_jax(
    positions: jax.Array,
    atoms: jax.Array,
    codes: jax.Array,
    count: jax.Array,
    amp_step: jax.Array,
    rep_q: jax.Array,
    *,
    n: int,
) -> jax.Array:
    """Order-free integer reconstruction (decode_mode='integer', format v2) —
    the MXU decode path.  Bitwise-identical to
    `oracle.mp.mp_decode_integer` on every backend.

    The spec (mod-2^32 integer accumulation of ``code * rep_q`` rows, then
    one f32 scale) is order-free, so instead of the sequential per-event
    overlap-add this runs three dense stages:

      1. scatter the masked codes into the dense coefficient map
         ``F [Npos, K]`` (int32 adds — exact, any order);
      2. ``partial[p, (u,c)] = sum_a F[p,a] * rep_q[a,u,c]`` as 4x2
         plane-split matmuls: both operands are decomposed into base-64
         planes (`_planes6`), each plane is exact in bfloat16, each plane
         product is < 2^12, and each f32-accumulated dot over K <= 4096 atoms
         stays < 2^24 — every partial sum is an exactly-representable
         integer, so the MXU result is exact regardless of reduction order;
      3. the anti-diagonal overlap-add ``out[t] += partial[t-u, u]`` as W
         static shifted int32 adds (wraparound = the spec's mod 2^32).

    `amp_step` is the host-computed ``f32(f32(scale) * step)`` per block.
    """
    k, w, c = rep_q.shape
    if k > 4096:
        raise ValueError("integer decode supports at most 4096 atoms per bank")
    npos = n - w + 1
    m = positions.shape[0]
    mask = jnp.arange(m) < count
    cz = jnp.where(mask, codes, 0).astype(jnp.int32)
    # 1-D scatter into the flattened map (friendlier TPU lowering than a 2-D
    # scatter); int32 adds are exact and order-free
    flat_idx = positions * k + atoms
    f_map = (
        jnp.zeros((npos * k,), jnp.int32).at[flat_idx].add(cz).reshape(npos, k)
    )
    f_planes = _planes6(f_map, 4)
    r_planes = _planes6(rep_q.reshape(k, w * c), 2)
    acc = jnp.zeros((npos, w * c), jnp.int32)
    for i, fp in enumerate(f_planes):
        for j, rp in enumerate(r_planes):
            p = jax.lax.dot_general(
                fp.astype(jnp.bfloat16),
                rp.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + (p.astype(jnp.int32) << (6 * (i + j)))
    pint = acc.reshape(npos, w, c)
    # anti-diagonal overlap-add out[t] = sum_u pint[t-u, u] as one stacked
    # reduction over w zero-padded shifts (no chained in-place updates)
    shifted = jnp.stack(
        [
            jnp.pad(pint[:, u, :], ((u, w - 1 - u), (0, 0)))
            for u in range(w)
        ]
    )  # [w, n, c]
    out = jnp.sum(shifted, axis=0, dtype=jnp.int32)
    return out.astype(jnp.float32) * amp_step.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n",))
def mp_decode_integer_batch_jax(
    positions: jax.Array,  # [B, M] i32
    atoms: jax.Array,  # [B, M] i32
    codes: jax.Array,  # [B, M] i32
    count: jax.Array,  # [B] i32
    amp_step: jax.Array,  # [B] f32
    rep_q: jax.Array,  # [K, W, C] i32
    *,
    n: int,
) -> jax.Array:
    """Batched order-free decode ``-> [B, N, C]``; per block identical to
    `mp_decode_integer_jax` (all arithmetic is exact, so batching cannot
    change a single bit)."""
    return jax.vmap(
        lambda p, a, cd, ct, st: mp_decode_integer_jax(
            p, a, cd, ct, st, rep_q, n=n
        )
    )(positions, atoms, codes, count, amp_step)


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
