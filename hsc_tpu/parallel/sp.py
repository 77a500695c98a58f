"""Context-parallel (sequence-parallel) exact greedy MP — SURVEY.md §2.3 P4.

For a single logical block too large for one chip, the time axis is sharded
over the 'seq' mesh axis.  Design (the codec analogue of ring attention, but
with *selection* collectives instead of attention passes):

  * init: one `ppermute` halo exchange of (W-1) signal samples so every
    shard's valid-mode correlation is boundary-exact;
  * per greedy iteration: local two-stage selection on the shard's
    incrementally-maintained colmax cache, then a global reduction —
    `pmax` of the local best value, `pmin` position tie-break, and one packed
    `psum` broadcast of the winning (t, f, code, score);
  * update: NO score data ever moves between shards — every shard knows the
    global winner and applies the (lag-masked) Gram-row subtraction to
    whatever part of the ±(W-1) window it owns.  Boundary-crossing updates
    are handled by index clamping + lag masking, so a shard with no overlap
    performs an exact no-op.

Latency note (SURVEY.md §7 H5): three small collectives per retained
coefficient ride the ICI; use SP only when a block exceeds one chip's memory —
otherwise blockwise DP (parallel/dp.py) is strictly better.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.encode import EncodedBlock


@jax.jit
def _block_energy(x: jax.Array) -> jax.Array:
    """Float32 block energy — the exact expression of the single-device init
    (`ops.encode.encode_init_jax`), compiled standalone so the value feeds
    the sharded loop as a replicated scalar."""
    return jnp.sum(jnp.square(x.astype(jnp.float32)))


def sp_encode(
    mesh: Mesh,
    x: jax.Array,
    bank: jax.Array,
    gram_t: jax.Array,
    *,
    num_coefs: int,
    amp_bits: int = 16,
    tolerance_snr: float | None = None,
    singleton_weight: float = 1.0,
    n_raw: int | None = None,
    num_select: int = 1,
    axis: str = "seq",
) -> EncodedBlock:
    """Encode ONE block ``x [N, C]`` sharded along time over `axis`.

    Emits the same stream as the single-device encoder given identical
    correlation values (the greedy loop arithmetic is replicated bit-for-bit;
    every shard returns identical event buffers).  `num_select > 1` runs the
    spec's multi-select sweeps (reference `nbBlocks`; see
    `oracle.mp.mp_encode`): candidates come from the sweep-start colmax
    snapshot, one per contiguous position segment, accepted left-to-right
    under the 2W-1 interference guard — segments may span shards, so each
    segment runs the same pmax/pmin/psum selection collectives as a plain
    iteration.  The block energy e0 is a scalar *init input* (the oracle
    accepts it injected, like scores0): it is computed ONCE here with the
    same full-array float32 reduction the single-device init uses and
    broadcast to every shard, so the SNR stop is bitwise identical to the
    single-device encoder even exactly at the threshold — no psum of
    per-shard partials is involved.
    """
    k, w, c = bank.shape
    if n_raw is None:
        n_raw = k
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    s = int(mesh.shape[axis])
    if n % s != 0:
        raise ValueError(f"N={n} must divide the {axis}-axis size {s}")
    l = n // s
    if l < 2 * w:
        raise ValueError(f"shard length {l} must be >= 2*W={2*w}")
    npos_total = n - w + 1
    lag = 2 * w - 1
    # spec segment length for multi-select sweeps (oracle.mp.mp_encode)
    seg_len = (
        128 * (-(-npos_total // (128 * num_select))) if num_select > 1 else 0
    )
    maxcode = float((1 << (amp_bits - 1)) - 1)
    snr_factor = 10.0 ** (-tolerance_snr / 10.0) if tolerance_snr is not None else None

    def init_fn(x_loc, bank):
        # x_loc: the local chunk [L, C] of the sharded signal.
        sid = jax.lax.axis_index(axis)
        # ---- halo exchange: W-1 samples from the right neighbor ----------
        halo = jax.lax.ppermute(
            x_loc[: w - 1], axis, [(i + 1, i) for i in range(s - 1)]
        )
        x_ext = jnp.concatenate([x_loc, halo], axis=0)  # [L + W - 1, C]
        # ---- local correlation (boundary-exact) --------------------------
        lhs = x_ext.T[None]  # [1, C, L+W-1]
        rhs = bank.transpose(0, 2, 1)  # [K, C, W]
        scores0 = jax.lax.conv_general_dilated(
            lhs, rhs, (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[0]  # [K, L] — global positions [sid*L, sid*L + L)
        gpos0 = sid * l
        valid = (gpos0 + jnp.arange(l)) < npos_total  # [L]
        peak_loc = jnp.max(jnp.where(valid[None, :], jnp.abs(scores0), 0.0))
        peak = jax.lax.pmax(peak_loc, axis)
        return scores0, peak

    def shard_fn(scores0, e0, scale, inv_scale, bank, gram_t):
        # scores0: the local [K, L] shard of the init correlation; scale /
        # inv_scale are the host-computed spec divisions (ops.encode
        # .quantizer_steps — jitted backend division is not IEEE-exact).
        sid = jax.lax.axis_index(axis)
        gpos0 = sid * l
        valid = (gpos0 + jnp.arange(l)) < npos_total  # [L]
        weights = jnp.where(
            jnp.arange(k) < n_raw, jnp.float32(1), jnp.float32(singleton_weight)
        )
        snr_thr = (
            e0 * jnp.float32(snr_factor) if snr_factor is not None else jnp.float32(-1)
        )

        # Lag-padded local buffers (same layout as ops.encode): local position
        # p at column p + (W-1).
        scores_pad = jnp.zeros((k, l + 2 * w - 2), dtype=jnp.float32)
        scores_pad = jax.lax.dynamic_update_slice(scores_pad, scores0, (0, w - 1))
        colmax0 = jnp.where(
            valid, jnp.max(jnp.abs(scores0) * weights[:, None], axis=0), jnp.float32(-1)
        )
        colmax_pad = jnp.full((l + 2 * w - 2,), jnp.float32(-1))
        colmax_pad = jax.lax.dynamic_update_slice(colmax_pad, colmax0, (w - 1,))

        big = jnp.int32(npos_total + 1)

        def body(carry, _):
            scores_pad, colmax_pad, e_res, done, positions, atoms, codes, count = carry
            colmax_valid = jax.lax.dynamic_slice(colmax_pad, (w - 1,), (l,))
            t_loc = jnp.argmax(colmax_valid).astype(jnp.int32)
            v_loc = colmax_valid[t_loc]
            v_glob = jax.lax.pmax(v_loc, axis)
            t_glob_cand = jnp.where(
                v_loc == v_glob, gpos0 + t_loc, big
            ).astype(jnp.int32)
            t_glob = jax.lax.pmin(t_glob_cand, axis)  # tie-break: lowest position
            am_winner = t_glob_cand == t_glob
            # winner extracts the atom + score; others contribute zeros
            col = jax.lax.dynamic_slice(scores_pad, (0, t_loc + (w - 1)), (k, 1))[:, 0]
            f_loc = jnp.argmax(jnp.abs(col) * weights).astype(jnp.int32)
            s_loc = col[f_loc]
            # quantizer spec: round half away from zero (see oracle.mp)
            y = s_loc * inv_scale
            r = jnp.floor(jnp.abs(y) + jnp.float32(0.5)) * jnp.sign(y)
            code_loc = jnp.clip(r, -maxcode, maxcode).astype(jnp.int32)
            packed = jnp.where(
                am_winner,
                jnp.stack(
                    [
                        f_loc.astype(jnp.float32),
                        code_loc.astype(jnp.float32),
                        s_loc,
                    ]
                ),
                jnp.zeros((3,), jnp.float32),
            )
            f_g, code_g, s_g = jax.lax.psum(packed, axis)
            f = f_g.astype(jnp.int32)
            code = code_g.astype(jnp.int32)
            s_val = s_g

            emit = jnp.logical_and(jnp.logical_not(done), code != 0)
            c_hat = jnp.where(emit, code.astype(jnp.float32) * scale, jnp.float32(0))

            positions = positions.at[count].set(
                jnp.where(emit, t_glob, positions[count])
            )
            atoms = atoms.at[count].set(jnp.where(emit, f, atoms[count]))
            codes = codes.at[count].set(jnp.where(emit, code, codes[count]))
            count = count + emit.astype(jnp.int32)

            e_step = jax.lax.optimization_barrier(jnp.float32(2.0) * c_hat * s_val)
            e_sq = jax.lax.optimization_barrier(c_hat * c_hat)
            e_res = jnp.where(emit, (e_res - e_step) + e_sq, e_res)

            scores_pad, colmax_pad = apply_update(
                scores_pad, colmax_pad, t_glob, f, c_hat
            )

            done = jnp.logical_or(
                jnp.logical_or(done, code == 0),
                jnp.logical_and(emit, e_res <= snr_thr),
            )
            return (
                scores_pad, colmax_pad, e_res, done, positions, atoms, codes, count,
            ), None

        def apply_update(scores_pad, colmax_pad, t_glob, f, c_hat):
            """Boundary-exact local window update for a global pick (shared by
            the single-select body above and the sweep path): clamp + lag-mask
            makes non-overlapping shards perform an exact no-op."""
            ps = t_glob - gpos0
            ps_c = jnp.clip(ps, 0, l - 1)
            offset = ps_c - ps
            gram_row = gram_t[f]
            lags = jnp.arange(lag) + offset
            lag_ok = jnp.logical_and(lags >= 0, lags < lag)
            row = jnp.where(
                lag_ok[None, :],
                jnp.take(gram_row, jnp.clip(lags, 0, lag - 1), axis=1),
                jnp.float32(0),
            )
            window = jax.lax.dynamic_slice(scores_pad, (0, ps_c), (k, lag))
            window = window - jax.lax.optimization_barrier(c_hat * row)
            scores_pad = jax.lax.dynamic_update_slice(scores_pad, window, (0, ps_c))
            touched_gpos = gpos0 + (jnp.arange(lag) + ps_c - (w - 1))
            touched_valid = jnp.logical_and(
                touched_gpos >= 0, touched_gpos < npos_total
            )
            cm = jnp.where(
                touched_valid,
                jnp.max(jnp.abs(window) * weights[:, None], axis=0),
                jnp.float32(-1),
            )
            colmax_pad = jax.lax.dynamic_update_slice(colmax_pad, cm, (ps_c,))
            return scores_pad, colmax_pad

        def seg_body(j, carry):
            # one segment of a multi-select sweep — identical spec semantics
            # to ops.encode.mp_encode_from_init's seg_body, with the three
            # selection collectives of the plain SP iteration
            (snapshot, scores_pad, colmax_pad, e_res, done, positions, atoms,
             codes, count, last_t, any_acc) = carry
            lo = j * seg_len
            gpos = gpos0 + jnp.arange(l)
            in_seg = jnp.logical_and(gpos >= lo, gpos < lo + seg_len)
            seg_loc = jnp.where(in_seg, snapshot, jnp.float32(-1))
            t_loc = jnp.argmax(seg_loc).astype(jnp.int32)
            v_loc = seg_loc[t_loc]
            seg_best = jax.lax.pmax(v_loc, axis)
            t_cand = jnp.where(
                jnp.logical_and(v_loc == seg_best, seg_best >= 0),
                gpos0 + t_loc,
                big,
            ).astype(jnp.int32)
            t_glob = jax.lax.pmin(t_cand, axis)
            am_winner = jnp.logical_and(t_cand == t_glob, seg_best >= 0)
            t_safe = jnp.clip(t_glob - gpos0, 0, l - 1)
            col = jax.lax.dynamic_slice(
                scores_pad, (0, t_safe + (w - 1)), (k, 1)
            )[:, 0]
            f_loc = jnp.argmax(jnp.abs(col) * weights).astype(jnp.int32)
            s_loc = col[f_loc]
            y = s_loc * inv_scale
            r = jnp.floor(jnp.abs(y) + jnp.float32(0.5)) * jnp.sign(y)
            code_loc = jnp.clip(r, -maxcode, maxcode).astype(jnp.int32)
            packed = jnp.where(
                am_winner,
                jnp.stack(
                    [f_loc.astype(jnp.float32), code_loc.astype(jnp.float32), s_loc]
                ),
                jnp.zeros((3,), jnp.float32),
            )
            f_g, code_g, s_g = jax.lax.psum(packed, axis)
            f = f_g.astype(jnp.int32)
            code = code_g.astype(jnp.int32)
            guard_ok = jnp.logical_or(last_t < 0, t_glob - last_t >= 2 * w - 1)
            emit = (
                jnp.logical_not(done)
                & (seg_best >= 0)
                & (code != 0)
                & guard_ok
                & (count < num_coefs)
            )
            c_hat = jnp.where(emit, code.astype(jnp.float32) * scale, jnp.float32(0))
            positions = positions.at[count].set(
                jnp.where(emit, t_glob, positions[count])
            )
            atoms = atoms.at[count].set(jnp.where(emit, f, atoms[count]))
            codes = codes.at[count].set(jnp.where(emit, code, codes[count]))
            count = count + emit.astype(jnp.int32)
            e_step = jax.lax.optimization_barrier(jnp.float32(2.0) * c_hat * s_g)
            e_sq = jax.lax.optimization_barrier(c_hat * c_hat)
            e_res = jnp.where(emit, (e_res - e_step) + e_sq, e_res)
            scores_pad, colmax_pad = apply_update(
                scores_pad, colmax_pad, t_glob, f, c_hat
            )
            last_t = jnp.where(emit, t_glob, last_t)
            any_acc = jnp.logical_or(any_acc, emit)
            done = jnp.logical_or(done, jnp.logical_and(emit, e_res <= snr_thr))
            return (snapshot, scores_pad, colmax_pad, e_res, done, positions,
                    atoms, codes, count, last_t, any_acc)

        def sweep_cond(carry):
            (_, _, _, done, _, _, _, count) = carry
            return jnp.logical_and(jnp.logical_not(done), count < num_coefs)

        def sweep_body(carry):
            scores_pad, colmax_pad, e_res, done, positions, atoms, codes, count = carry
            snapshot = jax.lax.dynamic_slice(colmax_pad, (w - 1,), (l,))
            out = jax.lax.fori_loop(
                0,
                num_select,
                seg_body,
                (snapshot, scores_pad, colmax_pad, e_res, done, positions,
                 atoms, codes, count, jnp.int32(-1), jnp.bool_(False)),
            )
            (_, scores_pad, colmax_pad, e_res, done, positions, atoms, codes,
             count, _, any_acc) = out
            done = jnp.logical_or(done, jnp.logical_not(any_acc))
            return (scores_pad, colmax_pad, e_res, done, positions, atoms,
                    codes, count)

        init = (
            scores_pad,
            colmax_pad,
            e0,
            scale <= 0,
            jnp.zeros((num_coefs,), dtype=jnp.int32),
            jnp.zeros((num_coefs,), dtype=jnp.int32),
            jnp.zeros((num_coefs,), dtype=jnp.int32),
            jnp.int32(0),
        )
        if num_select <= 1:
            (scores_pad, colmax_pad, e_res, done, positions, atoms, codes,
             count), _ = jax.lax.scan(body, init, None, length=num_coefs)
        else:
            (scores_pad, colmax_pad, e_res, done, positions, atoms, codes,
             count) = jax.lax.while_loop(sweep_cond, sweep_body, init)
        return EncodedBlock(
            positions=positions,
            atoms=atoms,
            codes=codes,
            count=count,
            scale=scale,
            energy0=e0,
            energy_res=jnp.maximum(e_res, jnp.float32(0)),
        )

    from ..ops.encode import quantizer_steps

    bank = jnp.asarray(bank, jnp.float32)
    init = jax.jit(
        jax.shard_map(
            init_fn,
            mesh=mesh,
            in_specs=(P(axis, None), P()),
            out_specs=(P(None, axis), P()),
            check_vma=False,
        )
    )
    scores0_g, peak = init(x, bank)
    # e0 is an init input to the spec loop (oracle.mp.mp_encode accepts it
    # injected): ONE full-array reduction, identical to the single-device
    # init's `jnp.sum(jnp.square(x))`, so SP's SNR stop is bitwise the
    # single-device stop unconditionally — never a psum of shard partials.
    e0 = _block_energy(x)
    scale, inv = quantizer_steps(np.asarray(jax.device_get(peak)), amp_bits)
    loop = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(None, axis), P(), P(), P(), P(), P()),
            out_specs=EncodedBlock(
                positions=P(), atoms=P(), codes=P(), count=P(),
                scale=P(), energy0=P(), energy_res=P(),
            ),
            check_vma=False,
        )
    )
    return loop(
        scores0_g, e0, jnp.float32(scale), jnp.float32(inv),
        bank, jnp.asarray(gram_t, jnp.float32),
    )
