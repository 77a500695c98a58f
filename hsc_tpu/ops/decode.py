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


def _round_up_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


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
    overlap-add this runs three dense stages (scatter-free — XLA TPU scatter
    compiles pathologically and executes serially):

      1. ``crow[i, (u,c)] = code_i * rep_q[atom_i, u, c]`` — an int32 gather
         + multiply (exact: |crow| < 2^27), decomposed into four base-256
         planes, each exactly representable in bfloat16;
      2. ``partial[p, (u,c)] = sum_i [positions_i == p] * crow[i, (u,c)]``
         — per position chunk, an iota-compare one-hot mask [chunk, E]
         matmul'd against each crow plane on the MXU with f32 accumulation:
         plane products are < 2^8 and each dot over E events stays < 2^24,
         so every partial sum is an exactly-representable integer and the
         result is exact regardless of reduction order.  Chunks run under
         one `lax.scan` so the [chunk, E] mask never materializes whole;
      3. the anti-diagonal overlap-add ``out[t] += partial[t-u, u]`` as one
         stacked reduction over W zero-padded shifts (int32 wraparound = the
         spec's mod 2^32).

    `amp_step` is the host-computed ``f32(f32(scale) * step)`` per block.
    """
    k, w, c = rep_q.shape
    npos = n - w + 1
    m = positions.shape[0]
    if m * 255 >= (1 << 24):
        # the one-hot dots sum <= m plane values of < 2^8 each; beyond this
        # the f32 partial sums stop being exact integers (CodecConfig
        # enforces the same bound for decode_mode='integer')
        raise ValueError(
            "integer decode exactness bound: event capacity must satisfy "
            f"m * 255 < 2^24 (got m={m})"
        )
    mask = jnp.arange(m) < count
    cz = jnp.where(mask, codes, 0).astype(jnp.int32)
    crow = (cz[:, None, None] * rep_q[atoms]).reshape(m, w * c)
    planes = []
    cur = crow
    for _ in range(3):
        hi = cur >> 8
        planes.append((cur - (hi << 8)).astype(jnp.bfloat16))
        cur = hi
    planes.append(cur.astype(jnp.bfloat16))  # top plane in [-8, 7]
    # all four planes ride ONE matmul (output lanes = 4*W*C, keeping the MXU
    # lane dimension full instead of 4 quarter-width calls)
    plane_mat = jnp.concatenate(planes, axis=1)  # [E, 4*w*c]

    chunk = min(2048, _round_up_pow2(npos))
    npos_pad = -(-npos // chunk) * chunk
    pos_col = positions[None, :]

    def chunk_body(_, p0):
        iota = p0 + jnp.arange(chunk)
        msk = (pos_col == iota[:, None]).astype(jnp.bfloat16)  # [chunk, E]
        mm = jax.lax.dot_general(
            msk, plane_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        acc = jnp.zeros((chunk, w * c), jnp.int32)
        for j in range(4):
            acc = acc + (mm[:, j * w * c : (j + 1) * w * c] << (8 * j))
        return None, acc

    _, parts = jax.lax.scan(
        chunk_body, None, jnp.arange(0, npos_pad, chunk, dtype=jnp.int32)
    )
    pint = parts.reshape(npos_pad, w, c)[:npos]
    # events with index >= count have cz == 0, so their crow rows are zero —
    # padded positions (often 0) contribute nothing even where the mask hits
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
