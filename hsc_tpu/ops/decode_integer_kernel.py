"""Fused Pallas kernel for order-free integer decode (format v2).

The XLA path (`ops.decode.mp_decode_integer_jax`) is bitwise-exact but
spends most of its time off the MXU: the one-hot shift/mask builds and the
digit-plane staging materialize several MB of intermediates per block
through HBM (BASELINE.md decode headroom note, VERDICT r2 #2).  This kernel
runs the whole pipeline out of VMEM, one block per grid program:

  1. *gather* — ``crow[j, e] = rep_q[atom_e, j]`` as one-hot MXU matmuls
     over two balanced int8 base-256 digit planes of the quantized
     representations (transposed ``[W, K]`` layout, events on lanes), then
     ``val = cz * crow`` in int32 (exact: |val| < 2^27, the same bound as
     the XLA path);
  2. *shift* — each event's W-wide row moves to its in-bucket offset
     ``r = pos mod W`` by ceil(log2 W) rounds of a UNIFORM sublane
     `pltpu.roll` plus a per-lane bit-select (``r = sum_k b_k 2^k``; the
     buffer has >= W zero rows above the data, so the circular roll never
     wraps values into view) — no per-event loop, no [E, W, 2W] one-hot;
  3. *bucket* — ``bucket[q, :] = sum_e [q_e == q] * shifted[e]`` as ONE
     int8 x int8 -> int32 MXU matmul per block over the four balanced
     digit planes of `val` (the iota-compare one-hot mask is built in
     VMEM and never touches HBM);
  4. *recombine + fold* — digits rejoin in int32 (wraparound = the spec's
     mod 2^32), bucket rows overlap-fold at stride W, and the single f32
     scale is applied in-kernel.

Exactness: every step is integer until the final ``int32 -> f32`` convert
and multiply, which are the spec's own two ops — so the output is bitwise
`oracle.mp.mp_decode_integer` (asserted in interpret mode by tests and on
hardware by scripts/check_tpu_parity.py).

Single-channel representations only (the signal-space reconstruction
surface, same constraint as `ops.decode_kernel`); callers fall back to the
XLA path for multichannel intermediates — `mp_decode_integer_batch`
dispatches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode import mp_decode_integer_batch_jax


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _balanced_digit(cur):
    """One balanced base-256 digit d in [-128, 127] and the exact quotient
    (cur - d) / 256 — the same split as the XLA path and the oracle."""
    d = ((cur + 128) & 255) - 128
    return d, (cur - d) >> 8


def _int_decode_kernel(
    q_ref,  # [1, 1, M] i32 VMEM — bucket index per event
    r_ref,  # [1, 1, M] i32 VMEM — in-bucket offset per event
    cz_ref,  # [1, 1, M] i32 VMEM — count-masked codes
    atom_ref,  # [1, 1, M] i32 VMEM
    step_ref,  # [1, 1, 1] f32 SMEM — amp_step for this block
    rep0_ref,  # [W8, Kp] i8 VMEM (resident) — low rep digit, transposed
    rep1_ref,  # [W8, Kp] i8 VMEM (resident) — high rep digit, transposed
    out_ref,  # [1, NQR, W] f32 VMEM
    *,
    w: int,
    k: int,
    h: int,
    nq: int,
    nq_rows: int,
    m: int,
    wpad: int,
):
    kp = rep0_ref.shape[1]
    atoms = atom_ref[0]  # [1, M]
    # ---- gather: one-hot(atom) matmul over the rep digit planes ----------
    kiota = jax.lax.broadcasted_iota(jnp.int32, (kp, m), 0)
    onehot_k = (kiota == atoms).astype(jnp.int8)  # [Kp, M]
    g0 = jax.lax.dot_general(
        rep0_ref[:, :], onehot_k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [W8, M]
    g1 = jax.lax.dot_general(
        rep1_ref[:, :], onehot_k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    val = (g0 + (g1 << 8)) * cz_ref[0]  # [W8, M] i32, |val| < 2^27

    # ---- shift: val rows [0, W) move down by r_e (per-lane) ---------------
    # Buffer height H >= 2W with zero rows above W, so ceil(log2 W) uniform
    # circular sublane rolls + bit selects realize the per-event shift:
    # rolled-in rows are always zeros.
    w8 = val.shape[0]
    buf = jnp.concatenate(
        [val, jnp.zeros((h - w8, m), jnp.int32)], axis=0
    )  # [H, M] — rows >= W are zero (gather pads are zero rows)
    r_row = r_ref[0]  # [1, M]
    shift = 1
    while shift < w:
        bit = (r_row & shift) != 0  # [1, M], broadcasts over sublanes
        buf = jnp.where(bit, pltpu.roll(buf, shift, 0), buf)
        shift *= 2

    # ---- balanced digit planes of the shifted rows ------------------------
    planes = []
    cur = buf
    for _ in range(3):
        d, cur = _balanced_digit(cur)
        planes.append(d.astype(jnp.int8))
    planes.append(cur.astype(jnp.int8))  # top digit (|val| < 2^27)
    digall = jnp.concatenate(planes, axis=0)  # [4H, M] i8

    # ---- bucket: one iota-compare one-hot, one MXU matmul ------------------
    qiota = jax.lax.broadcasted_iota(jnp.int32, (nq_rows, m), 0)
    maskq = (qiota == q_ref[0]).astype(jnp.int8)  # [NQR, M]
    bucket = jax.lax.dot_general(
        maskq, digall, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [NQR, 4H] i32 — per-digit sums <= M * 128, far inside int32

    # ---- recombine digits (mod-2^32 wraparound = the spec) and fold -------
    acc = bucket[:, :h]
    for j in range(1, 4):
        acc = acc + (bucket[:, j * h : (j + 1) * h] << (8 * j))
    lo = acc[:, :w]  # [NQR, W]
    hi = acc[:, w : 2 * w]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nq_rows, w), 0)
    hi_prev = jnp.where(row_ids == 0, 0, pltpu.roll(hi, 1, 0))
    folded = lo + hi_prev  # row q covers samples [W*q, W*q + W)
    if wpad != w:
        # lane-pad the store: a W-lane out block is only Mosaic-tileable
        # when W divides the 128-lane tile (or is a multiple of it) —
        # round-5 container fuzz found non-power-of-two W (33/40/48/59)
        # silently mis-lowering the store on hardware while W in {32, 64,
        # 96} worked; interpret mode cannot see it.  Callers slice the pad.
        folded = jnp.concatenate(
            [folded, jnp.zeros((nq_rows, wpad - w), jnp.int32)], axis=1
        )
    out_ref[0, :, :] = folded.astype(jnp.float32) * step_ref[0, 0, 0]


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def mp_decode_integer_pallas(
    positions: jax.Array,  # [B, M] i32
    atoms: jax.Array,  # [B, M] i32
    codes: jax.Array,  # [B, M] i32
    count: jax.Array,  # [B] i32
    amp_step: jax.Array,  # [B] f32
    rep_q: jax.Array,  # [K, W, 1] i32
    *,
    n: int,
    interpret: bool = False,
) -> jax.Array:
    """Batched fused integer decode ``-> [B, N, 1]``; bitwise identical to
    `mp_decode_integer_batch_jax` (pure integer arithmetic plus the spec's
    final f32 convert+scale)."""
    b, m_in = positions.shape
    k, w, c = rep_q.shape
    if c != 1:
        raise ValueError("pallas integer decode supports single-channel reps")
    if m_in >= (1 << 24):
        raise ValueError(
            f"integer decode event capacity must satisfy m < 2^24 (got m={m_in})"
        )
    npos = n - w + 1
    nq = -(-npos // w)
    # one extra row catches the last bucket's overlap spill; int8 mask rows
    # tile at 32 sublanes
    nq_rows = _round_up(nq + 1, 32)
    # H to a multiple of 64 (not just 8): the round-5 hardware bisect
    # (BASELINE "container fuzz") mapped the mis-lowering envelope of the
    # shift/bucket pipeline — h in {64, 128, 192} is correct, h in {72,
    # 80, 96, 120} silently corrupts on hardware (interpret mode cannot
    # see it), i.e. the sublane roll over [H, M] wants whole 8-vreg
    # groups.  Zero padding, so the integers are unchanged.
    h = _round_up(2 * w, 64)
    m = _round_up(m_in, 128)
    kp = _round_up(k, 128)
    w8 = _round_up(w, 8)
    # out-block lane width, padded to a multiple of 32: round-5 container
    # fuzz found W in {33, 40, 48, 59} mis-lowering the store on hardware
    # (silent wrong values) while W in {32, 64, 96} is correct — the
    # empirical safe envelope is multiple-of-32 lane widths.  Callers
    # slice the pad off.
    wpad = _round_up(w, 32)

    # ---- XLA-side event preprocessing (cheap, fused) -----------------------
    if m != m_in:
        pad = ((0, 0), (0, m - m_in))
        positions = jnp.pad(positions, pad)
        atoms = jnp.pad(atoms, pad)
        codes = jnp.pad(codes, pad)
    q = positions // w
    r = positions - q * w
    cz = jnp.where(
        jnp.arange(m)[None, :] < count[:, None], codes, 0
    ).astype(jnp.int32)
    # Mosaic requires the last-two block dims to divide (8, 128) or equal the
    # array dims — a (1, M) block over [B, M] fails the sublane rule for
    # B > 1 (hardware-only: interpret mode does not enforce tiling).  Carry
    # the per-event arrays as [B, 1, M] so the (1, 1, M) block's last two
    # dims equal the array's, like the output spec.
    q, r, cz, atoms = (a[:, None, :] for a in (q, r, cz, atoms))

    # ---- rep digit planes, transposed [W8, Kp] (resident) ------------------
    rq = rep_q[:, :, 0].astype(jnp.int32)  # [K, W]
    d0 = ((rq + 128) & 255) - 128
    d1 = (rq - d0) >> 8  # |rep| < 2^14 (rep_bits <= 12 + margin) -> int8
    rep0 = jnp.zeros((w8, kp), jnp.int8).at[:w, :k].set(d0.T.astype(jnp.int8))
    rep1 = jnp.zeros((w8, kp), jnp.int8).at[:w, :k].set(d1.T.astype(jnp.int8))

    kernel = functools.partial(
        _int_decode_kernel, w=w, k=k, h=h, nq=nq, nq_rows=nq_rows, m=m,
        wpad=wpad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((w8, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w8, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, nq_rows, wpad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
    )
    # VMEM high-water estimate: mask + digit planes + bucket + staging
    est = (
        nq_rows * m  # maskq i8
        + 4 * h * m  # digall i8
        + nq_rows * 4 * h * 4  # bucket i32
        + 3 * h * m * 4  # shift/val staging i32
        + kp * m  # onehot_k i8
        + nq_rows * 128 * 4 * 2  # out block (lane-padded), double-buffered
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, nq_rows, wpad), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(est * 1.6) + (4 << 20), 110 << 20)
        ),
    )(
        q, r, cz, atoms,
        amp_step[:, None, None].astype(jnp.float32), rep0, rep1
    )[0]
    return out[:, :, :w].reshape(b, nq_rows * w)[:, :n, None]


def pallas_integer_decode_ok(rep_q, m: int, n: int) -> bool:
    """True when the fused kernel supports this geometry (single-channel
    reps, in-budget VMEM); callers fall back to the XLA path otherwise."""
    k, w, c = rep_q.shape
    if c != 1:
        return False
    npos = n - w + 1
    nq_rows = _round_up(-(-npos // w) + 1, 32)
    h = _round_up(2 * w, 64)
    mp = _round_up(m, 128)
    est = nq_rows * mp + 4 * h * mp + nq_rows * 4 * h * 4 + 3 * h * mp * 4
    return est < (48 << 20)


def mp_decode_integer_batch(
    positions, atoms, codes, count, amp_step, rep_q, *, n: int
):
    """Dispatcher: fused Pallas kernel on TPU for single-channel reps,
    XLA path otherwise — identical bytes either way.
    ``HSC_TPU_INTEGER_KERNEL=off`` forces the XLA path (escape hatch)."""
    import os as _os

    if (
        _os.environ.get("HSC_TPU_INTEGER_KERNEL", "on") != "off"
        and jax.default_backend() in ("tpu", "axon")
        and pallas_integer_decode_ok(rep_q, positions.shape[1], n)
    ):
        return mp_decode_integer_pallas(
            positions, atoms, codes, count, amp_step, rep_q, n=n
        )
    return mp_decode_integer_batch_jax(
        positions, atoms, codes, count, amp_step, rep_q, n=n
    )
