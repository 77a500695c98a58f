"""Fused Pallas decode kernel: stream-order overlap-add out of VMEM.

The decode contract (docs/FORMAT.md) is sequential: contribution i is
``code_i * scale * bank[atom_i]`` added at ``pos_i`` with multiply-round-add-
round float32 arithmetic, in stream order.  The XLA scan path
(`ops.decode.mp_decode_jax`) is the portable definition; this kernel runs the
same arithmetic with the output block resident in VMEM (~64 KB for 16k
samples), one program per block:

  per event: aligned 128-lane chunk RMW — `pltpu.roll` positions the atom
  waveform at the in-chunk offset, the product takes a VMEM round-trip as the
  rounding point (same excess-precision firewall as the encoder), then one
  add and store back.

Single-channel banks only (the signal-space reconstruction path); callers
fall back to the XLA path for multichannel intermediate decodes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _decode_kernel(
    pos_ref,  # [G, M] i32 SMEM (this program's rows)
    atom_ref,  # [G, M] i32 SMEM
    code_ref,  # [G, M] i32 SMEM
    cnt_ref,  # [G, 1] i32 SMEM
    scale_ref,  # [G, 1] f32 SMEM
    bank_ref,  # [Ka, W] f32 VMEM (resident)
    out_ref,  # [G, 1, P] f32 VMEM output rows (padded; caller trims)
    prod,  # [G, 1, CW] f32 VMEM scratch (rounding firewall)
    *,
    w: int,
    n: int,
    group: int,
):
    """One program decodes `group` blocks with their event chains
    interleaved: per block the chain (SMEM reads -> roll -> firewall store
    -> chunk RMW) is serial by spec, but the G chains are independent and
    write disjoint output rows, so interleaving hides most of the chain
    latency (same trick as the encoder's group interleave)."""
    cw = _round_up(128 + w, 128)
    p = _round_up(n, 128) + cw
    counts = []
    scales = []
    for g in range(group):
        out_ref[g, :, :] = jnp.zeros((1, p), jnp.float32)
        counts.append(cnt_ref[g, 0])
        scales.append(scale_ref[g, 0])
    max_count = counts[0]
    for g in range(1, group):
        max_count = jnp.maximum(max_count, counts[g])

    def cond(i):
        return i < max_count

    def body(i):
        for g in range(group):

            @pl.when(i < counts[g])
            def _(g=g):
                t = pos_ref[g, i]
                f = atom_ref[g, i]
                c_hat = code_ref[g, i].astype(jnp.float32) * scales[g]
                a = pl.multiple_of((t // 128) * 128, 128)
                o = t - a
                row = bank_ref[pl.ds(f, 1), :][0]  # [W]
                u0 = jnp.concatenate(
                    [row[None, :], jnp.zeros((1, cw - w), jnp.float32)],
                    axis=1,
                )
                u = pltpu.roll(u0, o, 1)
                prod[g, :, :] = c_hat * u
                chunk = out_ref[g, :, pl.ds(a, cw)]
                out_ref[g, :, pl.ds(a, cw)] = chunk + prod[g, :, :]
        return i + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def mp_decode_pallas(
    positions: jax.Array,  # [B, M] i32
    atoms: jax.Array,  # [B, M] i32
    codes: jax.Array,  # [B, M] i32
    count: jax.Array,  # [B] i32
    scale: jax.Array,  # [B] f32
    bank: jax.Array,  # [Ka, W, 1]
    *,
    n: int,
    interpret: bool = False,
) -> jax.Array:
    """Batched fused decode ``-> [B, N, 1]``; byte-identical to
    `mp_decode_batch_jax` (same spec arithmetic in the same order)."""
    b, m = positions.shape
    ka, w, c = bank.shape
    if c != 1:
        raise ValueError("pallas decode supports single-channel banks")
    cw = _round_up(128 + w, 128)
    p = _round_up(n, 128) + cw
    # 8 blocks interleaved per program: the per-block event chain is serial
    # by spec; independent chains overlap most of the latency (same pattern
    # as the encoder's group interleave).  The batch is padded to a multiple
    # of `group` (padded rows have count == 0 and decode to discarded zeros)
    # so the per-program SMEM blocks satisfy Mosaic's divisible-by-8 rule —
    # blocking the event buffers per program is what keeps SMEM (~1 MiB)
    # bounded for arbitrarily large batches.  HSC_TPU_DECODE_GROUP tunes the
    # interleave width (multiples of 8; the chain is latency-bound with tiny
    # vector work, so wider groups keep scaling where the encoder's
    # heavyweight accepts stop at 2).  Default 16: the round-3 hardware A/B
    # measured 49.7 µs/block marginal at group 16 vs 52.0 at 8 and 54.0 at
    # 32 (BASELINE "Decode ('ordered')"); bitwise at 16 by test and parity.
    import os as _os

    group = max(8, int(_os.environ.get("HSC_TPU_DECODE_GROUP", "16")) // 8 * 8)
    b8 = _round_up(b, group)
    if b8 != b:
        pad = ((0, b8 - b), (0, 0))
        positions = jnp.pad(positions, pad)
        atoms = jnp.pad(atoms, pad)
        codes = jnp.pad(codes, pad)
        count = jnp.pad(count, (0, b8 - b))
        scale = jnp.pad(scale, (0, b8 - b))
    kernel = functools.partial(_decode_kernel, w=w, n=n, group=group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b8 // group,),
        in_specs=[
            pl.BlockSpec((group, m), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, m), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, m), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (ka, w), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),  # bank
        ],
        # the middle dim keeps the tiled trailing dims equal to the full
        # array shape (Mosaic tiling rule)
        out_specs=[
            pl.BlockSpec(
                (group, 1, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        scratch_shapes=[
            pltpu.VMEM((group, 1, cw), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b8, 1, p), jnp.float32)],
        interpret=interpret,
    )(
        positions, atoms, codes, count[:, None], scale[:, None],
        bank[:, :, 0],
    )[0]
    return out[:b, 0, :n, None]
