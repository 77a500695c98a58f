"""Sparse event-driven level->=1 init — the fast path of hier_init='int8'.

The level k >= 1 input map has at most num_coefs[k-1] nonzero cells out of
~npos*C (0.006%% at flagship scale), yet the dense init conv pays full dense
MACs: 47.4 ms/batch at f32-HIGHEST, 63%% of the whole 2-level encode, and
even the fused int8 digit-plane conv only bought 1.34x on hardware (the 4x2
digit split has ~8x the MACs of one bf16 pass at 2x the rate;
scripts/bench_int8_conv.py).  Sparsity is the real lever, and the exact
integer respec (`oracle.mp.int8_init_scores`) is what unlocks it: integer
tap accumulation is ORDER-FREE, so the init can run as per-event additions
of bank windows — a scatter in spirit, but into VMEM-resident int32 tap
buffers inside one Pallas program (never an XLA scatter — that lowers
pathologically, CLAUDE.md).

Per block (grid over B):
  * zero five int32 tap buffers [5, nr8, width] — T_s anti-diagonal sums of
    (map digit j) x (bank plane p), j+p = s, the SAME integers the dense
    spec defines (duplicate cells are pre-aggregated by `aggregate_codes`
    so digitization happens on CELL SUMS, bit-identical to the dense form);
  * for each event (position p, atom a, aggregated code v != 0): split v
    into four balanced base-256 digits (scalar ops), read the atom's two
    reversed bank-plane rows [nr8, W] (int32 VMEM, dynamic leading index —
    the gram_ref pattern of `mp_kernels`), form the five tap windows with
    8 scalar-vector multiplies + 3 adds, and RMW them into the tap buffers
    at a 128-aligned span with `pltpu.roll` placement (the accept path's
    proven pattern; o + W <= 256 so the roll never wraps);
  * epilogue: per 512-lane chunk, convert taps to f32 and recombine with
    the spec's FIXED grouping (power-of-two weights -> FMA-safe), scale by
    g = f32(prev_scale * step), write the raw-score rows, and accumulate
    the running |score| peak (max is exact, so kernel peak == XLA peak).

Singleton rows never enter the kernel: they are exact passthroughs of the
scaled map (`int8_assemble` builds them from the integer map XLA-side and
concatenates).  Output is BITWISE `ops.encode.encode_init_int_scores`' raw
rows — same integers, same conversions, same grouping — verified on
hardware by scripts/check_tpu_parity.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# aligned RMW span: event window base lane o < 128 plus W <= 128 lanes
_CW = 256
# epilogue chunk width (lanes per recombination step)
_CH = 512


def sparse_init_supported(n_raw: int, w: int, c_in: int, npos: int) -> bool:
    """Geometry gate for the sparse init kernel: the roll-placement span
    needs W <= 128, and the full-width tap + bank + out blocks must fit
    VMEM (v5e: 128 MiB physical; stay well under)."""
    if not (2 <= w <= 128):
        return False
    nr8 = _round_up(max(n_raw, 1), 8)
    lpad0 = _round_up(w - 1, 128) if w > 1 else 0
    npos_ch = _round_up(npos, _CH)
    width = lpad0 + npos_ch + _CW
    taps = 5 * nr8 * width * 4
    bank = 2 * c_in * nr8 * w * 4
    out = nr8 * npos_ch * 4
    return taps + bank + out < (80 << 20)


def _sparse_init_kernel(
    # inputs
    pos_ref,  # [B, M] i32 SMEM — event positions (map coordinates)
    atom_ref,  # [B, M] i32 SMEM — event atoms (map channels)
    code_ref,  # [B, M] i32 SMEM — aggregated cell codes (0 = skip)
    g_ref,  # [B, 1] f32 SMEM — f32(prev_scale * step) per block
    bank_ref,  # [2*C, nr8, W] i32 VMEM — reversed bank digit planes
    # outputs
    out_ref,  # [1, nr8, npos_ch] f32 VMEM — raw score rows (padded)
    peak_ref,  # [B, 1] f32 SMEM — max |raw score| over valid lanes
    # scratch
    taps,  # [5, nr8, width] i32 VMEM
    *,
    m: int,
    nr8: int,
    w: int,
    npos: int,
    npos_ch: int,
    lpad0: int,
    width: int,
):
    b = pl.program_id(0)
    for s in range(5):
        taps[s, :, :] = jnp.zeros((nr8, width), jnp.int32)
    g = g_ref[b, 0]

    def body(i, carry):
        v = code_ref[b, i]

        @pl.when(v != 0)
        def _():
            p = pos_ref[b, i]
            a = atom_ref[b, i]
            # four balanced base-256 digits of the aggregated cell code
            # (scalar int32 ops — exact, matches oracle.mp.balanced_digits)
            d0 = ((v + 128) & 255) - 128
            r1 = (v - d0) >> 8
            d1 = ((r1 + 128) & 255) - 128
            r2 = (r1 - d1) >> 8
            d2 = ((r2 + 128) & 255) - 128
            d3 = (r2 - d2) >> 8
            b0 = bank_ref[pl.ds(2 * a, 1), :, :][0]  # [nr8, W] i32
            b1 = bank_ref[pl.ds(2 * a + 1, 1), :, :][0]
            # five anti-diagonal tap windows T_s += sum_{j+p=s} d_j * b_p
            u_s = (
                d0 * b0,
                d0 * b1 + d1 * b0,
                d1 * b1 + d2 * b0,
                d2 * b1 + d3 * b0,
                d3 * b1,
            )
            # window placement: map position p lands at buffer lane
            # x0 = p + (lpad0 - (W - 1)) so the t=0 score column sits at
            # the 128-aligned lane lpad0 (epilogue reads stay aligned)
            x0 = p + jnp.int32(lpad0 - (w - 1))
            al = pl.multiple_of((x0 // 128) * 128, 128)
            o = x0 - al
            zpad = jnp.zeros((nr8, _CW - w), jnp.int32)
            for s in range(5):
                up = jnp.concatenate([u_s[s], zpad], axis=1)
                ur = pltpu.roll(up, o, 1)  # no wrap: o + W <= 256
                cur = taps[s, :, pl.ds(al, _CW)]
                taps[s, :, pl.ds(al, _CW)] = cur + ur
        return carry

    jax.lax.fori_loop(0, m, body, jnp.int32(0))

    # ---- recombine + scale + peak (bitwise the XLA spec epilogue) ----------
    peak = jnp.float32(0)
    for j in range(0, npos_ch, _CH):
        t = [
            taps[s, :, pl.ds(lpad0 + j, _CH)].astype(jnp.float32)
            for s in range(5)
        ]
        lo = t[0] + jnp.float32(256.0) * t[1]
        hi = jnp.float32(65536.0) * t[2] + jnp.float32(16777216.0) * t[3]
        rr = (lo + hi) + jnp.float32(4294967296.0) * t[4]
        sc = rr * g
        out_ref[0, :, pl.ds(j, _CH)] = sc
        lane = jax.lax.broadcasted_iota(jnp.int32, (nr8, _CH), 1) + j
        peak = jnp.maximum(
            peak,
            jnp.max(jnp.where(lane < npos, jnp.abs(sc), jnp.float32(0))),
        )
    peak_ref[b, 0] = peak


def sparse_init_raw_pallas(
    positions: jax.Array,  # [B, M] i32
    atoms: jax.Array,  # [B, M] i32
    agg_codes: jax.Array,  # [B, M] i32 (0 = padded / duplicate / zero cell)
    g: jax.Array,  # [B] f32 = f32(prev_scale * step)
    bank_rev: jax.Array,  # [2*C, nr8, W] i32 (build_bank_rev)
    *,
    npos: int,
    n_raw: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch the sparse init kernel: returns (raw_scores [B, nr8,
    npos_ch] f32 — callers slice [:, :n_raw, :npos] — and peak_raw [B])."""
    b, m = positions.shape
    twoc, nr8, w = bank_rev.shape
    assert nr8 == _round_up(max(n_raw, 1), 8)
    lpad0 = _round_up(w - 1, 128) if w > 1 else 0
    npos_ch = _round_up(npos, _CH)
    width = lpad0 + npos_ch + _CW
    kernel = functools.partial(
        _sparse_init_kernel,
        m=m, nr8=nr8, w=w, npos=npos, npos_ch=npos_ch, lpad0=lpad0,
        width=width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # positions [B, M]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # atoms [B, M]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # agg codes [B, M]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # g [B, 1]
            pl.BlockSpec(
                (twoc, nr8, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, nr8, npos_ch), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # peak [B, 1]
        ],
        scratch_shapes=[pltpu.VMEM((5, nr8, width), jnp.int32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, nr8, npos_ch), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
    ]
    vmem_limit = min(
        int((5 * nr8 * width + twoc * nr8 * w + nr8 * npos_ch) * 4 * 1.5)
        + (8 << 20),
        110 << 20,
    )
    raw, peak = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(positions, atoms, agg_codes, g[:, None], bank_rev)
    return raw, peak[:, 0]


def build_bank_rev(bank_planes: np.ndarray) -> np.ndarray:
    """Kernel layout of the quantized raw bank: from the conv-form planes
    ``[n_raw, W, C, 2]`` int8 (models.coder) to ``[2*C, nr8, W]`` int32 with
    the filter axis REVERSED — ``bank_rev[2a+p, k, d] = plane_p[k, W-1-d, a]``
    — so an event at map position p writes score columns t = p-W+1..p with
    the window's leftmost lane at t = p-W+1 (see the kernel's placement).
    Rows are zero-padded to nr8 (pad rows stay zero => zero scores)."""
    n_raw, w, c, _ = bank_planes.shape
    nr8 = _round_up(max(n_raw, 1), 8)
    out = np.zeros((2 * c, nr8, w), np.int32)
    rev = bank_planes[:, ::-1, :, :].astype(np.int32)  # [n_raw, W, C, 2]
    for p in range(2):
        # [C, n_raw, W]
        out[p::2][: c, :n_raw, :] = rev[:, :, :, p].transpose(2, 0, 1)
    return out


@functools.partial(jax.jit, static_argnames=("c_in",))
def aggregate_codes(
    positions: jax.Array,
    atoms: jax.Array,
    codes: jax.Array,
    count: jax.Array,
    *,
    c_in: int,
) -> jax.Array:
    """Cell-sum aggregation: ``agg[i] = sum_j [cell_j == cell_i] code_j`` at
    each cell's FIRST occurrence, 0 elsewhere (and 0 for padded events).

    The dense spec digitizes CELL SUMS (`feature_map_int_jax` then
    `balanced_digits`); the kernel digitizes per event — identical integers
    only if duplicate (position, atom) cells are pre-summed, which this
    does.  int32 adds wrap mod 2^32 exactly like `_wrap_int32`.  O(M^2)
    compares per block — M <= a few hundred, negligible next to the init.
    """
    b, m = positions.shape
    valid = jnp.arange(m)[None, :] < count[:, None]
    key = jnp.where(valid, positions * jnp.int32(c_in) + atoms, -1)
    cz = jnp.where(valid, codes, 0).astype(jnp.int32)
    eq = key[:, :, None] == key[:, None, :]  # [B, M, M]
    agg = jnp.einsum(
        "bij,bj->bi", eq.astype(jnp.int32), cz,
        preferred_element_type=jnp.int32,
    )
    lower = jnp.arange(m)[None, :] < jnp.arange(m)[:, None]  # j < i
    first = ~jnp.any(eq & lower[None, :, :], axis=2)
    return jnp.where(valid & first, agg, 0)
