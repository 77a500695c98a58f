"""Fused Pallas TPU kernel for the greedy MP loop — the §3.3 hot path.

One `pallas_call` program encodes one signal block end-to-end: the padded
score matrix lives in VMEM for the whole greedy loop (no HBM round-trips per
iteration), selection uses the incrementally-maintained per-position colmax
cache, and the Gram-row subtraction touches only the ±(W-1) window.  This is
the Pallas counterpart of `ops.encode.mp_encode_jax` (same spec arithmetic,
same emitted stream) and replaces the reference's NumPy inner loop
(`hsc/modeling.py :: ConvolutionalMatchingPursuit.computeCoefficients`).

Mosaic constraint shaping the design: vector loads/stores need 128-aligned
dynamic lane offsets (and tile-aligned widths), but the greedy window lands at
arbitrary positions — so each iteration operates on a 128-aligned chunk of
`CW = round_up(128 + 2W-1, 128)` lanes that is guaranteed to contain the
±(W-1) window, and the Gram row is placed inside the chunk with a dynamic
`pltpu.roll`:

  per iteration:  colmax argmax (vector)  ->  aligned chunk load  ->
  one-hot column extract + quantize       ->  roll(gram_row) subtract  ->
  aligned chunk store + masked colmax refresh

Memory plan per program (16k-sample / 64-atom flagship config):
  scores  [K, 128 + Npos_pad + CW]  f32  ~4.3 MB   VMEM scratch (DMA'd in)
  colmax  [1, same]                 f32  ~68 KB
  gram    [K, K, 2W-1]              f32  ~1.0 MB   resident across grid
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encode import (
    EncodedBlock,
    encode_init_batched as encode_init,
    quantizer_steps,
)

def _lpad(w: int) -> int:
    """Left pad of the position axis: 128-aligned static slack that keeps the
    aligned chunk containing any +-(W-1) update window inside the buffer.
    128 covers W <= 129; wider atoms get proportionally more (a fixed 128
    would produce negative chunk offsets -- undefined Mosaic behavior)."""
    return max(128, _round_up(w - 1, 128))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_fold(npos: int, w: int) -> int:
    """Fold factor (sublane rows of the selection cache) the fused kernel
    uses for a given (npos, w) geometry: the largest power of two <= 8 whose
    folded row length still covers one update chunk."""
    lag = 2 * w - 1
    cw = _round_up(128 + lag, 128)
    fold = 8
    while fold > 1 and _round_up(npos, fold * 128) // fold < cw:
        fold //= 2
    return fold


def pallas_num_select_options(npos: int, w: int) -> tuple[int, ...]:
    """num_select values the fused kernel supports for this geometry:
    1 (plain greedy), the fold factor (segments == selection-cache rows),
    and 2x the fold factor when each row splits into two 128-aligned spec
    segments (``l8/2`` must equal the spec ``seg_len`` for 2*fold segments —
    true whenever the folded row length is a multiple of 256).  Callers
    route other S to the XLA multi-select path (same emitted stream)."""
    fold = pallas_fold(npos, w)
    opts = [1, fold]
    l8 = _round_up(npos, fold * 128) // fold
    seg_len_2x = 128 * (-(-npos // (128 * fold * 2)))
    if fold > 1 and l8 % 256 == 0 and l8 // 2 == seg_len_2x:
        opts.append(2 * fold)
    return tuple(dict.fromkeys(opts))


def _mp_kernel(
    # inputs (full arrays; grid programs index their own rows via program_id)
    e0_ref,  # [B, 1] f32 SMEM
    sc_ref,  # [B, 1] f32 SMEM — per-block quantizer step (XLA-computed)
    inv_ref,  # [B, 1] f32 SMEM — per-block inverse step (XLA-computed)
    scores_hbm,  # [B, K, npos_pad] f32 ANY (stays in HBM)
    gram_ref,  # [K, K, lag] f32 VMEM (resident)
    w_ref,  # [K, 1] f32 VMEM (selection weights, sublane layout)
    w_row_ref,  # [1, K] f32 VMEM (selection weights, lane layout)
    # outputs
    pos_ref,  # [B, M] i32 SMEM
    atom_ref,  # [B, M] i32 SMEM
    code_ref,  # [B, M] i32 SMEM
    cnt_ref,  # [B, 1] i32 SMEM
    scale_ref,  # [B, 1] f32 SMEM
    eres_ref,  # [B, 1] f32 SMEM
    # scratch: scores [G, K, P2] f32, colmax [G, fold, L8+CW] f32 (position-
    # folded selection caches), [prod [G, K, CW] f32 — the VMEM FMA firewall,
    # absent under mxu_update (the MXU boundary rounds) and under
    # bitcast_fence (registers round instead)], sems (G,) DMA semaphores
    *scratch,
    k: int,
    w: int,
    lpad: int,
    npos: int,
    npos_pad: int,
    num_coefs: int,
    maxcode: float,
    snr_factor: float | None,
    fold: int,
    group: int,
    num_select: int,
    mxu_extract: bool,
    mxu_update: bool,
    sweep_batched: bool,
    uniform_w: bool,
    narrow: bool,
    fit_span: bool,
    bitcast_fence: bool,
):
    """One program encodes `group` blocks with their greedy loops interleaved.

    The single-block loop is latency-bound: each iteration is a serial
    scalar<->vector dependency chain (argmax -> index -> column -> quantize ->
    windowed update -> cache refresh).  Interleaving G independent blocks in
    one while loop gives the scheduler G disjoint chains to overlap, hiding
    most of that latency at the cost of G copies of the VMEM state.

    `mxu_extract` / `mxu_update` independently move the per-accept column
    extraction and the Gram-row placement onto the MXU via 0/1 one-hot
    matmuls (exact f32 passthrough — see `process_candidate`), cutting the
    VPU issue work that bounds the loop (BASELINE.md "speed-of-light").
    `uniform_w` specializes away the selection-weight multiplies when every
    weight is 1.
    """
    if mxu_update or bitcast_fence:
        scores, colmax, sems = scratch
        prod = None
    else:
        scores, colmax, prod, sems = scratch
    lag = 2 * w - 1
    cw = _round_up(128 + lag, 128)  # aligned chunk width covering any window
    # colmax is folded position-major into `fold` sublane rows so selection
    # runs at full VPU width: position p lives at (row p // L8, lane p % L8).
    # Row-major order == position order, so max+min-index selection keeps the
    # spec tie-break (lowest position).  L8 is 128-aligned; each row carries
    # CW slack lanes so the (aligned) window RMW below never leaves its row.
    npos_pad8 = _round_up(npos, fold * 128)
    l8 = npos_pad8 // fold
    p2 = lpad + npos_pad8 + cw
    base = pl.program_id(0) * group

    # ---- load all group members' scores into padded VMEM scratch ----------
    copies = []
    for g in range(group):
        scores[g, :, :] = jnp.zeros((k, p2), jnp.float32)
        cp = pltpu.make_async_copy(
            scores_hbm.at[base + g],
            scores.at[g, :, pl.ds(lpad, npos_pad)],
            sems.at[g],
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    # Quantizer steps are computed by XLA in the init stage (exact IEEE
    # divisions); the kernel never divides — some backends lower in-loop
    # fdiv to an approximate reciprocal (SURVEY.md H2).
    scales = []
    inv_scales = []
    snr_thrs = []
    for g in range(group):
        scale = sc_ref[base + g, 0]
        scales.append(scale)
        inv_scales.append(inv_ref[base + g, 0])
        scale_ref[base + g, 0] = scale
        e0 = e0_ref[base + g, 0]
        snr_thrs.append(
            e0 * jnp.float32(snr_factor)
            if snr_factor is not None
            else jnp.float32(-1)
        )

    def _weighted(v):
        """Selection weighting of |scores| (skipped when all weights are 1)."""
        return v if uniform_w else v * w_ref[:, :1]

    # Folded colmax init: one static row per fold of the position axis.  Pad
    # lanes — alignment tail and RMW slack, which Gram updates can spill real
    # values into — are parked at -1; real colmax is >= 0 and selection takes
    # the lowest position on ties, so pads can never win.
    row_cols = jax.lax.broadcasted_iota(jnp.int32, (1, l8), 1)
    for g in range(group):
        colmax[g, :, :] = jnp.full((fold, l8 + cw), -1.0, jnp.float32)
        fold_rows = []
        for r in range(fold):
            seg = scores[g, :, lpad + r * l8 : lpad + (r + 1) * l8]  # [K, L8]
            cm_r = jnp.max(_weighted(jnp.abs(seg)), axis=0)[None, :]
            fold_rows.append(
                jnp.where(row_cols + r * l8 < npos, cm_r, jnp.float32(-1))
            )
        colmax[g, :, :l8] = jnp.concatenate(fold_rows, axis=0)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1)
    lane_ids128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    # spans the narrow/fit-span accept dispatches over (128 when the +-(W-1)
    # window fits the chunk's first lane-tile, full CW otherwise)
    spans = (128, cw) if (narrow or fit_span) else (cw,)
    lane_ids_by_span = {128: lane_ids128, cw: lane_ids}
    if mxu_update:
        # Lane-minus-row iota: `dmat == o` is the 0/1 placement matrix
        # P[i, j] = (j == o + i) used by the per-accept matmuls.
        dmat_by_span = {
            s: (
                jax.lax.broadcasted_iota(jnp.int32, (lag, s), 1)
                - jax.lax.broadcasted_iota(jnp.int32, (lag, s), 0)
            )
            for s in spans
        }
    if mxu_extract:
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    fold_rows_ids = jax.lax.broadcasted_iota(jnp.int32, (fold, l8), 0)
    fold_cols_ids = jax.lax.broadcasted_iota(jnp.int32, (fold, l8), 1)
    fold_pos_ids = fold_rows_ids * l8 + fold_cols_ids  # position of each cell
    big_pos = jnp.int32(npos_pad8 + 1)
    rmw_rows_by_span = {
        s: jax.lax.broadcasted_iota(jnp.int32, (fold, s), 0) for s in spans
    }
    rmw_lanes_by_span = {
        s: jax.lax.broadcasted_iota(jnp.int32, (fold, s), 1) for s in spans
    }
    atom_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    def cond(state):
        i, dones, e_ress, counts = state
        alive = jnp.logical_not(dones[0])
        for g in range(1, group):
            alive = jnp.logical_or(alive, jnp.logical_not(dones[g]))
        return jnp.logical_and(i < num_coefs, alive)

    def _select_quantize(g, read, olane, span):
        """Selection + quantization from an already-read [K, span] window
        whose lane `olane` holds the candidate position's score column."""
        ids = lane_ids_by_span[span]
        if mxu_extract:
            # One-hot x f32 matmul at HIGHEST precision is an EXACT
            # passthrough: 1.0 is exact in bf16, the f32 operand's 3-way
            # bf16 split telescopes exactly (hi+mid spans 17 mantissa bits,
            # +lo reconstructs the original 24), and the remaining products
            # are exact zeros — so MXU extraction is bitwise the VPU
            # mask-and-sum it replaces, while costing no VPU issue slots.
            emat = jnp.where(ids == olane, jnp.float32(1), jnp.float32(0))
            col_row = jax.lax.dot_general(
                emat, read, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [1, K] — the score column at position t, lane layout
            wrow = (
                jnp.abs(col_row)
                if uniform_w
                else jnp.abs(col_row) * w_row_ref[:, :]
            )
            f = jnp.argmax(wrow, axis=1)[0].astype(jnp.int32)
            s = jnp.sum(jnp.where(lane_k == f, col_row, jnp.float32(0)))
        else:
            col = jnp.sum(
                jnp.where(ids == olane, read, jnp.float32(0)),
                axis=1,
                keepdims=True,
            )  # [K, 1]
            wcol = jnp.abs(col) * w_ref[:, :1]
            f = jnp.argmax(wcol[:, 0][None, :], axis=1)[0].astype(jnp.int32)
            s = jnp.sum(jnp.where(atom_ids == f, col, jnp.float32(0)))
        # quantizer spec: round half away from zero (see oracle.mp.mp_encode)
        y = s * inv_scales[g]
        r = jnp.floor(jnp.abs(y) + jnp.float32(0.5)) * jnp.sign(y)
        code_f = jnp.clip(r, -jnp.float32(maxcode), jnp.float32(maxcode))
        code = code_f.astype(jnp.int32)
        return f, s, code_f, code

    def extract_candidate(g, t):
        """Selection + quantization for position t from the CURRENT scores:
        the serial half of an accept.  Returns (a, o, chunk, f, s, code_f,
        code) — `chunk` is the aligned [K, CW] window read this makes, so
        the serial accept path can reuse it for the update."""
        cs = t + lpad - (w - 1)
        a = pl.multiple_of((cs // 128) * 128, 128)
        o = cs - a
        if narrow:
            # Read only the 128-lane tile containing the score column
            # (lane o + w - 1 of the CW chunk) — the extraction needs one
            # column, so the full-chunk read is pure issue waste.  The
            # update re-reads what it touches (apply_window_update_narrow),
            # which is bitwise-identical: nothing wrote between the two
            # reads of one accept.
            j = o + (w - 1)
            tile = j // 128
            a1 = pl.multiple_of(a + tile * 128, 128)
            o1 = j - tile * 128
            chunk = None
            read = scores[g, :, pl.ds(a1, 128)]  # [K, 128]
            f, s, code_f, code = _select_quantize(g, read, o1, 128)
        else:
            chunk = scores[g, :, pl.ds(a, cw)]  # [K, CW]
            f, s, code_f, code = _select_quantize(g, chunk, o + (w - 1), cw)
        return a, o, chunk, f, s, code_f, code

    def process_candidate(g, t, extra_ok, guard_last_t, done, e_res, count):
        """Quantize + update for one candidate position t of group member g.

        `extra_ok` folds any additional acceptance conditions (multi-select
        segment validity / budget); `guard_last_t` is the last accepted
        position this sweep (-1 = none) for the 2W-1 interference guard, or
        None for single-select.  Returns (emit, snr_hit, new_e, new_count).
        """
        if fit_span:
            return _process_candidate_fit(
                g, t, extra_ok, guard_last_t, done, e_res, count
            )
        a, o, chunk, f, s, code_f, code = extract_candidate(g, t)
        emit = jnp.logical_and(jnp.logical_not(done), code != 0)
        emit = jnp.logical_and(emit, extra_ok)
        if guard_last_t is not None:
            guard_ok = jnp.logical_or(
                guard_last_t < 0, t - guard_last_t >= 2 * w - 1
            )
            emit = jnp.logical_and(emit, guard_ok)
        c_hat = jnp.where(emit, code_f * scales[g], jnp.float32(0))

        @pl.when(emit)
        def _():
            pos_ref[base + g, count] = t
            atom_ref[base + g, count] = f
            code_ref[base + g, count] = code

        new_count = count + emit.astype(jnp.int32)

        # residual-energy recursion (unit-norm atoms)
        e_step = jnp.float32(2.0) * c_hat * s
        new_e = jnp.where(emit, (e_res - e_step) + c_hat * c_hat, e_res)

        apply_window_update(g, a, o, f, c_hat, chunk)

        snr_hit = jnp.logical_and(emit, new_e <= snr_thrs[g])
        return emit, snr_hit, new_e, new_count

    def _process_candidate_fit(g, t, extra_ok, guard_last_t, done, e_res,
                               count):
        """Whole-accept span specialization (HSC_TPU_KERNEL_NARROW=fit): the
        serial accept — extraction read, quantization, RMW, cache refresh —
        runs entirely on the [K, 128] first lane-tile whenever the +-(W-1)
        window fits it (o + 2W-1 <= 128: ~(130-2W)/128 of uniformly-placed
        accepts), falling back to the wide [K, CW] form otherwise.  Unlike
        `narrow` (which re-reads per span and loses the serial path's
        extraction-chunk reuse — measured 18% SLOWER serial), both branches
        here read their window exactly ONCE and reuse it for the update, so
        the fitting branch halves the accept's chunk traffic at CW=256 with
        nothing re-read.  `lax.cond` carries the scalar results out of the
        branches (Mosaic lowers cond-with-results to scf.IfOp).

        Bitwise-exact vs the wide form: the masked column extraction zeroes
        the same non-column lanes, the windowed RMW arithmetic is per-lane
        identical on the lanes it touches and touches no lane outside the
        window, and the colmax refresh over the untouched tail lanes is
        idempotent (max has no rounding)."""
        cs = t + lpad - (w - 1)
        a = pl.multiple_of((cs // 128) * 128, 128)
        o = cs - a

        def accept(span):
            chunk = scores[g, :, pl.ds(a, span)]
            f, s, code_f, code = _select_quantize(
                g, chunk, o + (w - 1), span
            )
            emit = jnp.logical_and(jnp.logical_not(done), code != 0)
            emit = jnp.logical_and(emit, extra_ok)
            if guard_last_t is not None:
                guard_ok = jnp.logical_or(
                    guard_last_t < 0, t - guard_last_t >= 2 * w - 1
                )
                emit = jnp.logical_and(emit, guard_ok)
            c_hat = jnp.where(emit, code_f * scales[g], jnp.float32(0))

            @pl.when(emit)
            def _():
                pos_ref[base + g, count] = t
                atom_ref[base + g, count] = f
                code_ref[base + g, count] = code

            new_count = count + emit.astype(jnp.int32)
            e_step = jnp.float32(2.0) * c_hat * s
            new_e = jnp.where(emit, (e_res - e_step) + c_hat * c_hat, e_res)
            gram_row = gram_ref[pl.ds(f, 1), :, :][0]  # [K, lag]
            _update_span(g, a, o, gram_row, c_hat, span, chunk)
            snr_hit = jnp.logical_and(emit, new_e <= snr_thrs[g])
            return emit, snr_hit, new_e, new_count

        return jax.lax.cond(
            o + lag <= 128, lambda: accept(128), lambda: accept(cw)
        )

    def apply_window_update(g, a, o, f, c_hat, chunk):
        """Gram-domain windowed update + colmax cache refresh for one accept
        at aligned chunk (a, o): ``chunk - c_hat * place(gram[f], o)`` stored
        back, then the folded selection cache rewritten from the new chunk.
        `chunk` must be the CURRENT [K, CW] window contents (None in narrow
        mode, which re-reads per span)."""
        gram_row = gram_ref[pl.ds(f, 1), :, :][0]  # [K, lag]
        if narrow:
            # Span-narrow update (HSC_TPU_KERNEL_NARROW): when the +-(W-1)
            # window fits the chunk's first 128-lane tile (o + lag <= 128 —
            # ~(129-lag)/128 of uniformly-placed accepts), the RMW + cache
            # refresh run on a [K, 128] slice instead of [K, CW], halving
            # that accept's vector issue work at CW=256.  Bitwise-exact:
            # lanes outside the narrow span are untouched (their stored
            # scores AND their cached colmax are already correct), and max
            # has no rounding, so refreshing a superset of changed lanes is
            # idempotent.  Both spans re-read their chunk fresh — required
            # in phase C (stale extraction chunks must not be written back)
            # and a bitwise no-op in the serial path (nothing wrote between
            # extraction and update of one accept).
            fits = o + lag <= 128

            @pl.when(fits)
            def _():
                _update_span(g, a, o, gram_row, c_hat, 128)

            @pl.when(jnp.logical_not(fits))
            def _():
                _update_span(g, a, o, gram_row, c_hat, cw)

            return
        _update_span(g, a, o, gram_row, c_hat, cw, chunk)

    def _update_span(g, a, o, gram_row, c_hat, span, chunk=None):
        """One accept's RMW + cache refresh confined to `span` aligned lanes
        at chunk offset a (requires o + lag <= span — guaranteed by the
        dispatch above).  `chunk` may pass in already-read window contents
        (the serial accept path reuses its extraction read); None re-reads.
        Two spec-equivalent update forms:

        * MXU placement (`mxu_update`): scale first (the spec's first
          float32 rounding — IEEE VPU mul on the narrow [K, lag] row), then
          place via the 0/1 matmul P[i, j] = (j == o + i) — an exact
          passthrough (see extract_candidate), and the MXU boundary is a
          hard rounding point, so the subtract cannot be FMA-contracted
          with the multiply: no firewall scratch is needed.
        * roll + firewall: place the Gram row with a dynamic roll (no
          wraparound: o + lag <= span).  The spec is multiply-round-
          subtract-round (the oracle's two float32 roundings); the TPU
          toolchain compiles with excess precision allowed, which would
          contract mul+sub into one rounding — so the product makes a real
          VMEM store/load round-trip, which the compiler must honor as a
          rounding point.  (Pre-padding the Gram to CW lanes was tried and
          measured SLOWER: the 4x bigger resident Gram shrinks the
          interleave-group budget.)
        """
        if chunk is None:
            chunk = scores[g, :, pl.ds(a, span)]
        if mxu_update:
            pmat = jnp.where(
                dmat_by_span[span] == o, jnp.float32(1), jnp.float32(0)
            )
            gsc = c_hat * gram_row
            u = jax.lax.dot_general(
                gsc, pmat, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [K, span]
            chunk_new = chunk - u
        else:
            u0 = jnp.concatenate(
                [gram_row, jnp.zeros((k, span - lag), jnp.float32)], axis=1
            )
            u = pltpu.roll(u0, o, 1)  # no wrap: o + lag <= span
            # The spec needs a rounding fence between the product and the
            # subtract (multiply-round-subtract-round; excess-precision
            # compilation would otherwise contract them into one FMA
            # rounding).  jax.lax.optimization_barrier is IMPOSSIBLE here —
            # Mosaic has no lowering for it in TC kernels
            # (NotImplementedError; round-4 hardware run, docs/DESIGN.md
            # rule 3).  Two usable fences:
            if bitcast_fence:
                # HSC_TPU_KERNEL_FENCE=bitcast: round-trip the product
                # through int32 REGISTERS (tpu.bitcast x2) — `arith.mulf ->
                # tpu.bitcast -> tpu.bitcast -> arith.subf` has no
                # contractible mulf->subf edge, and costs no VMEM traffic
                # (the vmem fence moves 2·K·span/1024 vregs per accept).
                # Hardware parity (pinned-oracle streams) is the authority
                # that the compiler does not fold the bitcast pair back
                # into a contraction; interpret mode cannot tell.
                p = pltpu.bitcast(
                    pltpu.bitcast(c_hat * u, jnp.int32), jnp.float32
                )
                chunk_new = chunk - p
            else:
                # default: the product makes a real VMEM store/load round
                # trip, which the compiler must honor as a rounding point.
                prod[g, :, :span] = c_hat * u
                chunk_new = chunk - prod[g, :, :span]
        scores[g, :, pl.ds(a, span)] = chunk_new
        _refresh_span(g, a, chunk_new, span)

    def _refresh_span(g, a, chunk_new, span):
        """Exact folded-colmax refresh over `span` lanes at chunk offset a;
        positions outside [0, npos) stay parked at -1."""
        gpos = lane_ids_by_span[span] + (a - lpad)
        cm = jnp.where(
            jnp.logical_and(gpos >= 0, gpos < npos),
            jnp.max(_weighted(jnp.abs(chunk_new)), axis=0)[None, :],
            jnp.float32(-1),
        )
        if lpad > l8:
            # Wide atoms on short blocks (only reachable at fold == 1, where
            # l8 = round_up(npos, 128) can be smaller than the left pad):
            # the aligned chunk can start at p0 < -l8, putting r0 <= -2 so
            # NEITHER blend below would write a row — the refresh would
            # silently no-op and selection would re-read stale maxima.
            # Recompute the whole (single) row from the stored scores
            # instead: max has no rounding, so the full recompute is bitwise
            # the incremental refresh, and the geometry is tiny by
            # construction (npos < cw).
            seg = scores[g, :, lpad : lpad + l8]  # [K, L8]
            cm_full = jnp.max(_weighted(jnp.abs(seg)), axis=0)[None, :]
            colmax[g, :, :l8] = jnp.where(
                row_cols < npos, cm_full, jnp.float32(-1)
            )
        else:
            # Write cm into the folded cache with two aligned
            # read-modify-write blends.  Chunk positions [p0, p0+CW) live in
            # fold row r0 at lanes [c0, c0+CW) (possibly spilling into the
            # row's slack lanes — never selected) and, when the chunk
            # crosses a row boundary, also at the head of row r0+1 (the
            # authoritative copy selection reads).  lpad <= l8 here, so
            # p0 >= -l8 and r0 >= -1: every real position the chunk covers
            # is written by one of the two blends.
            p0 = a - lpad
            r0 = jnp.floor_divide(p0, l8)
            c0 = pl.multiple_of(p0 - r0 * l8, 128)
            rows_s = rmw_rows_by_span[span]
            lanes_s = rmw_lanes_by_span[span]
            cm8 = jnp.broadcast_to(cm, (fold, span))
            sub_a = colmax[g, :, pl.ds(c0, span)]
            colmax[g, :, pl.ds(c0, span)] = jnp.where(rows_s == r0, cm8, sub_a)
            if span > 128:
                # row-boundary overlap blend — statically dead for span=128:
                # a, lpad, l8 are 128-multiples, so c0 <= l8 - 128 and
                # d_b = c0 + 128 - l8 <= 0 always
                shift_b = jnp.mod(c0 - l8, span)
                cm_b = jnp.broadcast_to(
                    pltpu.roll(cm, shift_b, 1), (fold, span)
                )
                d_b = c0 + span - l8  # overlap into the next row (<= 0: none)
                sub_b = colmax[g, :, :span]
                colmax[g, :, :span] = jnp.where(
                    jnp.logical_and(rows_s == r0 + 1, lanes_s < d_b),
                    cm_b,
                    sub_b,
                )

    def step_one(g, done, e_res, count):
        """One plain greedy iteration for group member g."""
        cm_fold = colmax[g, :, :l8]
        m = jnp.max(cm_fold)
        t = jnp.min(
            jnp.where(cm_fold == m, fold_pos_ids, big_pos)
        ).astype(jnp.int32)
        emit, snr_hit, new_e, new_count = process_candidate(
            g, t, jnp.bool_(True), None, done, e_res, count
        )
        new_done = jnp.logical_or(jnp.logical_not(emit), snr_hit)
        return new_done, new_e, new_count

    def step_sweep(g, done, e_res, count):
        """One multi-select sweep for group member g: the spec segments are
        the fold rows (num_select == fold, seg_len == L8) or aligned
        half-rows (num_select == 2*fold, seg_len == L8/2); one masked
        reduction pass per half yields all candidates from the sweep-start
        cache, then left-to-right guarded acceptance (oracle semantics —
        see oracle.mp.mp_encode num_select)."""
        halves = num_select // fold  # 1 or 2 (validated above)
        l8h = l8 // halves
        cm_fold = colmax[g, :, :l8]
        seg_max = []  # per half: [fold, 1]
        seg_col = []
        for h in range(halves):
            if halves == 1:
                vals = cm_fold
            else:
                in_half = jnp.logical_and(
                    fold_cols_ids >= h * l8h, fold_cols_ids < (h + 1) * l8h
                )
                vals = jnp.where(in_half, cm_fold, jnp.float32(-1))
            m_h = jnp.max(vals, axis=1, keepdims=True)
            seg_max.append(m_h)
            seg_col.append(
                jnp.min(
                    jnp.where(vals == m_h, fold_cols_ids, big_pos),
                    axis=1,
                    keepdims=True,
                )
            )  # lowest in-segment position on ties
        last_t = jnp.int32(-1)
        any_acc = jnp.bool_(False)
        for j in range(fold):
            for h in range(halves):
                seg_ok = jnp.logical_and(
                    seg_max[h][j, 0] >= 0, count < num_coefs
                )
                t_j = (j * l8 + seg_col[h][j, 0]).astype(jnp.int32)
                t_j = jnp.minimum(t_j, jnp.int32(npos - 1))  # empty-seg clamp
                emit, snr_hit, e_res, count = process_candidate(
                    g, t_j, seg_ok, last_t, done, e_res, count
                )
                last_t = jnp.where(emit, t_j, last_t)
                any_acc = jnp.logical_or(any_acc, emit)
                done = jnp.logical_or(done, snr_hit)
        done = jnp.logical_or(done, jnp.logical_not(any_acc))
        done = jnp.logical_or(done, count >= num_coefs)
        return done, e_res, count

    def step_sweep_batched(g, done, e_res, count):
        """`step_sweep` with the per-accept serial chain broken three ways
        (VERDICT r2 #1 — sweep-batched accepts):

          A. all S candidates' extractions + quantizations read the
             PRE-SWEEP scores — independent chains the scheduler can
             overlap.  This is exact, not approximate: a candidate that
             gets accepted passed the 2W-1 guard, so no earlier accept of
             the same sweep touched its score column (updates reach
             +-(W-1) positions; accepted candidates are >= 2W-1 apart,
             and candidates are segment-ordered left-to-right).  A
             candidate whose column WAS touched necessarily fails the
             guard, so its (stale) code is never used;
          B. the accept chain (guard / budget / SNR-stop / event stores)
             is pure scalar work over the precomputed candidates;
          C. updates of accepted candidates run with a FRESH chunk read
             (aligned 256-lane chunks of two accepted windows can overlap
             even though the windows themselves are disjoint, so stale
             phase-A chunks must not be written back), skipped entirely
             for rejected candidates (the serial path pays the full RMW +
             cache refresh for zero-c_hat no-ops).

        Emits bit-identical streams to `step_sweep` (oracle semantics)."""
        halves = num_select // fold
        l8h = l8 // halves
        cm_fold = colmax[g, :, :l8]
        seg_max = []
        seg_col = []
        for h in range(halves):
            if halves == 1:
                vals = cm_fold
            else:
                in_half = jnp.logical_and(
                    fold_cols_ids >= h * l8h, fold_cols_ids < (h + 1) * l8h
                )
                vals = jnp.where(in_half, cm_fold, jnp.float32(-1))
            m_h = jnp.max(vals, axis=1, keepdims=True)
            seg_max.append(m_h)
            seg_col.append(
                jnp.min(
                    jnp.where(vals == m_h, fold_cols_ids, big_pos),
                    axis=1,
                    keepdims=True,
                )
            )
        # ---- phase A: independent candidate extractions (pre-sweep) -------
        cands = []
        for j in range(fold):
            for h in range(halves):
                seg_exists = seg_max[h][j, 0] >= 0
                t_j = (j * l8 + seg_col[h][j, 0]).astype(jnp.int32)
                t_j = jnp.minimum(t_j, jnp.int32(npos - 1))
                a, o, _chunk, f, s, code_f, code = extract_candidate(g, t_j)
                cands.append((t_j, seg_exists, a, o, f, s, code_f, code))
        # ---- phase B: scalar accept chain ----------------------------------
        last_t = jnp.int32(-1)
        any_acc = jnp.bool_(False)
        accepts = []
        for t_j, seg_exists, a, o, f, s, code_f, code in cands:
            seg_ok = jnp.logical_and(seg_exists, count < num_coefs)
            guard_ok = jnp.logical_or(last_t < 0, t_j - last_t >= 2 * w - 1)
            emit = (
                jnp.logical_not(done) & (code != 0) & seg_ok & guard_ok
            )
            c_hat = jnp.where(emit, code_f * scales[g], jnp.float32(0))

            @pl.when(emit)
            def _(t_j=t_j, f=f, code=code, count=count):
                pos_ref[base + g, count] = t_j
                atom_ref[base + g, count] = f
                code_ref[base + g, count] = code

            count = count + emit.astype(jnp.int32)
            e_step = jnp.float32(2.0) * c_hat * s
            e_res = jnp.where(emit, (e_res - e_step) + c_hat * c_hat, e_res)
            done = jnp.logical_or(
                done, jnp.logical_and(emit, e_res <= snr_thrs[g])
            )
            last_t = jnp.where(emit, t_j, last_t)
            any_acc = jnp.logical_or(any_acc, emit)
            accepts.append((emit, a, o, f, c_hat))
        # ---- phase C: updates for accepted candidates only -----------------
        for emit, a, o, f, c_hat in accepts:

            @pl.when(emit)
            def _(a=a, o=o, f=f, c_hat=c_hat):
                apply_window_update(
                    g, a, o, f, c_hat,
                    None if narrow else scores[g, :, pl.ds(a, cw)],
                )

        done = jnp.logical_or(done, jnp.logical_not(any_acc))
        done = jnp.logical_or(done, count >= num_coefs)
        return done, e_res, count

    if num_select <= 1:
        step = step_one
    elif sweep_batched:
        step = step_sweep_batched
    else:
        step = step_sweep

    def body(state):
        i, dones, e_ress, counts = state
        new_dones, new_es, new_counts = [], [], []
        for g in range(group):
            nd, ne, nc = step(g, dones[g], e_ress[g], counts[g])
            new_dones.append(nd)
            new_es.append(ne)
            new_counts.append(nc)
        return (i + 1, tuple(new_dones), tuple(new_es), tuple(new_counts))

    init = (
        jnp.int32(0),
        tuple(scales[g] <= 0 for g in range(group)),
        tuple(e0_ref[base + g, 0] for g in range(group)),
        tuple(jnp.int32(0) for _ in range(group)),
    )
    _, dones, e_ress, counts = jax.lax.while_loop(cond, body, init)
    for g in range(group):
        cnt_ref[base + g, 0] = counts[g]
        eres_ref[base + g, 0] = jnp.maximum(e_ress[g], jnp.float32(0))


def mp_encode_pallas(
    xs: jax.Array,
    bank: jax.Array,
    gram_t: jax.Array,
    *,
    num_coefs: int,
    amp_bits: int = 16,
    tolerance_snr: float | None = None,
    singleton_weight: float = 1.0,
    n_raw: int | None = None,
    num_select: int = 1,
    interpret: bool = False,
    accept_mode: str | None = None,
    sweep_mode: str | None = None,
    narrow_mode: str | None = None,
    fence_mode: str | None = None,
) -> EncodedBlock:
    """Batched fused encode: ``xs [B, N, C]`` -> EncodedBlock (batched).

    Same stream contract as `mp_encode_jax` (golden-loop tested).  Two jit
    stages: `encode_init` (standalone, fusion-isolated — see its docstring),
    then one Pallas program per block running the greedy loop out of VMEM.
    `accept_mode` / `sweep_mode` / `narrow_mode` / `fence_mode` override
    HSC_TPU_KERNEL_ACCEPT / _SWEEP / _NARROW / _FENCE (tests exercise
    every combination in one process this way).
    """
    scores0, e0, peak = encode_init(xs, bank)
    scale, inv = quantizer_steps(jax.device_get(peak), amp_bits)
    return _mp_pallas_stage(
        scores0, e0, jnp.asarray(scale), jnp.asarray(inv), bank, gram_t,
        num_coefs=num_coefs, amp_bits=amp_bits, tolerance_snr=tolerance_snr,
        singleton_weight=singleton_weight, n_raw=n_raw,
        num_select=num_select, interpret=interpret, accept_mode=accept_mode,
        sweep_mode=sweep_mode, narrow_mode=narrow_mode,
        fence_mode=fence_mode,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_coefs", "amp_bits", "tolerance_snr", "singleton_weight", "n_raw",
        "num_select", "interpret", "accept_mode", "sweep_mode", "narrow_mode",
        "fence_mode",
    ),
)
def _mp_pallas_stage(
    scores0: jax.Array,
    e0: jax.Array,
    scale_in: jax.Array,
    inv_in: jax.Array,
    bank: jax.Array,
    gram_t: jax.Array,
    *,
    num_coefs: int,
    amp_bits: int,
    tolerance_snr: float | None,
    singleton_weight: float,
    n_raw: int | None,
    num_select: int = 1,
    interpret: bool = False,
    accept_mode: str | None = None,
    sweep_mode: str | None = None,
    narrow_mode: str | None = None,
    fence_mode: str | None = None,
) -> EncodedBlock:
    b, k, npos = scores0.shape
    _, w, _ = bank.shape
    if n_raw is None:
        n_raw = k
    # Mosaic requires sublane-aligned (multiple-of-8) slices of the f32
    # score buffers, so the atom axis is padded to K8 with silent rows:
    # zero scores and zero selection weight can never win a sweep (real
    # colmax >= 0 and argmax takes the first maximum), zero Gram rows/cols
    # keep updates from ever writing a nonzero into a pad row, and a pad
    # atom could only surface on an all-zero block where code==0 stops the
    # loop before anything is emitted.
    k8 = _round_up(k, 8)
    if k8 != k:
        scores0 = jnp.pad(scores0, ((0, 0), (0, k8 - k), (0, 0)))
        gram_t = jnp.pad(
            jnp.asarray(gram_t), ((0, k8 - k), (0, k8 - k), (0, 0))
        )
    npos_pad = _round_up(npos, 128)
    lag = 2 * w - 1
    cw = _round_up(128 + lag, 128)
    fold = pallas_fold(npos, w)
    if num_select not in pallas_num_select_options(npos, w):
        # the fused sweep requires segments == selection-cache rows (or
        # aligned half-rows); callers fall back to the XLA multi-select path
        # for other S (check `pallas_num_select_options` before calling)
        raise ValueError(
            f"pallas num_select must be one of "
            f"{pallas_num_select_options(npos, w)}"
        )
    npos_pad8 = _round_up(npos, fold * 128)
    l8 = npos_pad8 // fold
    lpad = _lpad(w)
    p2 = lpad + npos_pad8 + cw
    # blocks interleaved per program: as many as fit the VMEM budget (the
    # greedy loop is latency-bound; G independent chains overlap).  v5e has
    # 128 MiB of VMEM per core; the budget leaves headroom for Mosaic
    # temporaries and the DMA staging of the next program's scores.
    # Overridable for experiments: HSC_TPU_KERNEL_VMEM_MB / _GROUP_CAP.
    import os as _os

    env_vmem = _os.environ.get("HSC_TPU_KERNEL_VMEM_MB")
    group_cap = int(_os.environ.get("HSC_TPU_KERNEL_GROUP_CAP", "4"))
    # Per-accept work placement: HSC_TPU_KERNEL_ACCEPT selects which halves
    # of the accept run as one-hot MXU matmuls vs the all-VPU forms —
    # 'legacy' (VPU extraction + roll/firewall update), 'extract' (MXU
    # extraction only), 'update' (MXU placement only, no firewall scratch),
    # 'mxu' (both).  All four emit bitwise-identical streams
    # (hardware-verified); the default is the fastest measured combination.
    if accept_mode is None:
        accept_mode = _os.environ.get("HSC_TPU_KERNEL_ACCEPT", "extract")
    mxu_extract = accept_mode in ("mxu", "extract")
    mxu_update = accept_mode in ("mxu", "update")
    # HSC_TPU_KERNEL_SWEEP: 'serial' (default — one fully-serial accept
    # chain per candidate, whose extraction chunk read is REUSED by the
    # update) or 'batched' (phase-split sweeps with independent candidate
    # extractions, see step_sweep_batched).  Bitwise-identical streams
    # either way.  The round-3 hardware A/B measured serial FASTER (187.5
    # vs 157.7 MB/s at ns=8) despite batched's lower op count: phase
    # splitting forfeits the chunk reuse (phase-C updates must re-read
    # their window, stale extraction chunks must not be written back), and
    # the per-accept floor tracks chunk traffic, not issue-op count
    # (BASELINE "Issue-op accounting — A/B outcome").
    if sweep_mode is None:
        sweep_mode = _os.environ.get("HSC_TPU_KERNEL_SWEEP", "serial")
    sweep_batched = sweep_mode != "serial"
    # HSC_TPU_KERNEL_NARROW=1: tile-narrow extraction reads + span-narrow
    # updates (see apply_window_update's narrow branch).  Bitwise-identical
    # streams; default off — narrow helps batched sweeps (+5%: their
    # updates re-read anyway, so smaller reads win) but HURTS serial ones
    # (153.6 vs 187.5 MB/s: it forfeits the extraction-chunk reuse), and
    # serial is the default.  Only meaningful when the chunk is wider than
    # one lane-tile and the window can actually fit one (lag <= 128), and
    # the fold-row blends must be in play (lpad <= l8 — the tiny-geometry
    # full-recompute path stays wide).
    # HSC_TPU_KERNEL_NARROW=fit: whole-accept span specialization for the
    # SERIAL paths instead — each accept branches once on whether its
    # window fits the first 128-lane tile and runs read+update+refresh on
    # that span with the extraction read reused (the thing plain narrow
    # forfeits).  No effect on batched sweeps (their phases re-read by
    # design — plain narrow is their lever).
    if narrow_mode is None:
        narrow_mode = _os.environ.get("HSC_TPU_KERNEL_NARROW", "0")
    span_ok = cw > 128 and lag <= 128 and lpad <= l8
    narrow = narrow_mode not in ("0", "", "off", "fit") and span_ok
    fit_span = narrow_mode == "fit" and span_ok
    # HSC_TPU_KERNEL_FENCE: 'vmem' (default — the product's rounding fence
    # is a real VMEM store/load round trip) or 'bitcast' (tpu.bitcast pair
    # through int32 registers — no firewall scratch, no VMEM traffic; see
    # _update_span).  Both are spec-exact IF the compiler honors the fence;
    # scripts/check_tpu_parity.py on hardware is the authority (interpret
    # mode evaluates both identically).  Irrelevant under mxu_update.
    if fence_mode is None:
        fence_mode = _os.environ.get("HSC_TPU_KERNEL_FENCE", "vmem")
    bitcast_fence = fence_mode == "bitcast" and not mxu_update
    # Firewall form: the mul->VMEM store->load round trip is the rounding
    # point the toolchain must honor (docs/DESIGN.md "Numerical
    # reproducibility").  A cheaper fence via jax.lax.optimization_barrier
    # on the product was built and is unusable: Mosaic raises
    # NotImplementedError lowering the primitive inside a TC kernel
    # (round-4 hardware run) — do not re-try without checking the lowering
    # first.  mxu_update needs no firewall (the MXU boundary already
    # rounds).
    uniform_w = k8 == k and (n_raw >= k or singleton_weight == 1.0)
    per_block = (
        k8 * p2 + fold * (l8 + cw)
        + (0 if (mxu_update or bitcast_fence) else k8 * cw)
    ) * 4
    gram_bytes = k8 * k8 * lag * 4
    vmem_budget = (int(env_vmem) if env_vmem else 12) << 20
    min2 = 2 * per_block + gram_bytes
    if env_vmem is None and vmem_budget < min2 <= (52 << 20):
        # large-K geometries blow the conservative default before reaching
        # even a 2-way interleave, leaving the latency-bound loop a single
        # dependency chain; measured 18-21% faster at K=256 with group=2.
        # Only engaged when the default caps group at 1 (and never past
        # 52 MiB — headroom for Mosaic temporaries under the 110 MiB cap).
        vmem_budget = 52 << 20
    group = 1
    while (
        group * 2 <= group_cap  # never overshoot a non-power-of-two cap
        and b % (group * 2) == 0
        and (group * 2) * per_block + gram_bytes < vmem_budget
    ):
        group *= 2
    maxcode = float((1 << (amp_bits - 1)) - 1)
    snr_factor = 10.0 ** (-tolerance_snr / 10.0) if tolerance_snr is not None else None

    scores0 = jnp.pad(scores0, ((0, 0), (0, 0), (0, npos_pad - npos)))
    weights = jnp.where(
        jnp.arange(k8) < n_raw, jnp.float32(1), jnp.float32(singleton_weight)
    )[:, None] * (jnp.arange(k8) < k)[:, None].astype(jnp.float32)


    kernel = functools.partial(
        _mp_kernel,
        k=k8, w=w, lpad=lpad, npos=npos, npos_pad=npos_pad,
        num_coefs=num_coefs,
        maxcode=maxcode, snr_factor=snr_factor, fold=fold, group=group,
        num_select=num_select, mxu_extract=mxu_extract,
        mxu_update=mxu_update, sweep_batched=sweep_batched,
        uniform_w=uniform_w, narrow=narrow, fit_span=fit_span,
        bitcast_fence=bitcast_fence,
    )
    scratch_shapes = [
        pltpu.VMEM((group, k8, p2), jnp.float32),
        pltpu.VMEM((group, fold, l8 + cw), jnp.float32),
    ]
    # MUST mirror the kernel's scratch unpack branch (`mxu_update or
    # bitcast_fence` — the round-3 snapshot broke HEAD by divergence here)
    if not (mxu_update or bitcast_fence):
        scratch_shapes.append(pltpu.VMEM((group, k8, cw), jnp.float32))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((group,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # e0 [B, 1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scale [B, 1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inv_scale [B, 1]
            pl.BlockSpec(memory_space=pl.ANY),  # scores stay in HBM
            pl.BlockSpec((k8, k8, lag), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k8, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # positions [B, M]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # atoms [B, M]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # codes [B, M]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count [B, 1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scale [B, 1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # e_res [B, 1]
        ],
        scratch_shapes=scratch_shapes,
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, num_coefs), jnp.int32),
        jax.ShapeDtypeStruct((b, num_coefs), jnp.int32),
        jax.ShapeDtypeStruct((b, num_coefs), jnp.int32),
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
    ]
    # raise Mosaic's scoped-vmem cap (default 16 MiB) to what the scratch
    # actually needs, with headroom for compiler temporaries; v5e has
    # 128 MiB physical VMEM per core
    scratch_bytes = group * per_block + gram_bytes
    vmem_limit = min(int(scratch_bytes * 1.5) + (8 << 20), 110 << 20)
    positions, atoms, codes, count, scale, e_res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(e0[:, None], scale_in[:, None], inv_in[:, None], scores0,
      jnp.asarray(gram_t), weights, weights.reshape(1, k8))
    # SMEM event buffers beyond `count` are uninitialized — mask to match the
    # zero-padded contract of mp_encode_jax.
    mask = jnp.arange(num_coefs)[None, :] < count
    return EncodedBlock(
        positions=jnp.where(mask, positions, 0),
        atoms=jnp.where(mask, atoms, 0),
        codes=jnp.where(mask, codes, 0),
        count=count[:, 0],
        scale=scale[:, 0],
        energy0=e0,
        energy_res=e_res[:, 0],
    )
