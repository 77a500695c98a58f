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
    pos_ref,  # [B, M] i32 SMEM
    atom_ref,  # [B, M] i32 SMEM
    code_ref,  # [B, M] i32 SMEM
    cnt_ref,  # [B, 1] i32 SMEM
    scale_ref,  # [B, 1] f32 SMEM
    bank_ref,  # [Ka, W] f32 VMEM (resident)
    out_ref,  # [1, 1, P] f32 VMEM output block (padded; caller trims)
    prod,  # [1, CW] f32 VMEM scratch (rounding firewall)
    *,
    w: int,
    n: int,
):
    cw = _round_up(128 + w, 128)
    p = _round_up(n, 128) + cw
    b_idx = pl.program_id(0)
    out_ref[0, :, :] = jnp.zeros((1, p), jnp.float32)
    scale = scale_ref[b_idx, 0]
    count = cnt_ref[b_idx, 0]

    def cond(i):
        return i < count

    def body(i):
        t = pos_ref[b_idx, i]
        f = atom_ref[b_idx, i]
        c_hat = code_ref[b_idx, i].astype(jnp.float32) * scale
        a = pl.multiple_of((t // 128) * 128, 128)
        o = t - a
        row = bank_ref[pl.ds(f, 1), :][0]  # [W]
        u0 = jnp.concatenate(
            [row[None, :], jnp.zeros((1, cw - w), jnp.float32)], axis=1
        )
        u = pltpu.roll(u0, o, 1)
        prod[:, :] = c_hat * u
        chunk = out_ref[0, :, pl.ds(a, cw)]
        out_ref[0, :, pl.ds(a, cw)] = chunk + prod[:, :]
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
    kernel = functools.partial(_decode_kernel, w=w, n=n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # positions
            pl.BlockSpec(memory_space=pltpu.SMEM),  # atoms
            pl.BlockSpec(memory_space=pltpu.SMEM),  # codes
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scale
            pl.BlockSpec(
                (ka, w), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),  # bank
        ],
        # one padded row per program; the middle dim keeps the tiled trailing
        # dims equal to the full array shape (Mosaic tiling rule)
        out_specs=[
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        scratch_shapes=[
            pltpu.VMEM((1, cw), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, 1, p), jnp.float32)],
        interpret=interpret,
    )(
        positions, atoms, codes, count[:, None], scale[:, None],
        bank[:, :, 0],
    )[0]
    return out[:, 0, :n, None]
