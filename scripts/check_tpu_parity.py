"""Hardware verification: bit-exactness of the full codec on the real TPU.

Checks (SURVEY.md §7 H2 contracts):
  1. Pallas fused-kernel encode == pinned NumPy oracle streams (golden loop)
  2. XLA-path encode == pinned oracle (incl. num_select sweeps)
  3. hierarchical (2-level) device pipeline == pinned oracle streams
  4. corpus pipeline: packed bytes identical to oracle's; TPU decode bytes ==
     oracle decode bytes
  5. throughput summary

Run with the default environment (TPU relay); ~10 min cold (remote compiles),
fast afterward via the persistent compilation cache.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from hsc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
from hsc_tpu.io import pack_corpus
from hsc_tpu.models import HierarchicalConvolutionalSparseCoder
from hsc_tpu.ops import mp_encode_jax
from hsc_tpu.ops.mp_kernels import encode_init, mp_encode_pallas
from hsc_tpu.oracle import mp_decode, mp_encode
from pinned import oracle_encode_pinned, oracle_hierarchical_pinned

FAILURES = []


def check(name, ok):
    print(f"  [{'OK' if ok else 'FAIL'}] {name}", flush=True)
    if not ok:
        FAILURES.append(name)


def streams_equal(dev, ref, b=None):
    if b is None:
        n = int(dev.count)
        pos, atm, cds, scl = dev.positions, dev.atoms, dev.codes, dev.scale
    else:
        n = int(dev.count[b])
        pos, atm, cds, scl = dev.positions[b], dev.atoms[b], dev.codes[b], dev.scale[b]
    return (
        n == ref.positions.shape[0]
        and np.array_equal(np.asarray(pos[:n]), ref.positions)
        and np.array_equal(np.asarray(atm[:n]), ref.atoms)
        and np.array_equal(np.asarray(cds[:n]), ref.codes)
        and np.float32(scl) == ref.scale
    )


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- 1. flagship single-level, pallas kernel -------------------------
    cfg = make_test_config(
        counts=(64,), scales=(32,), block_size=16384, num_coefs=(512,)
    )
    mld = MultilevelDictionary.generate(cfg, seed=7)
    gen = SignalGenerator(mld, rates=2e-3)
    B = 16
    xs = gen.generate_signals(B, cfg.block_size, seed=3)
    bank = jnp.asarray(mld.augmented(0))
    gram_t = jnp.asarray(np.ascontiguousarray(mld.gram(0).transpose(1, 0, 2)))
    xb = jnp.asarray(xs)[:, :, None]

    t0 = time.time()
    pk = jax.device_get(mp_encode_pallas(xb, bank, gram_t, num_coefs=512))
    dt = time.time() - t0
    print(f"pallas encode B={B}: {dt:.1f}s (incl. compile)", flush=True)
    s0, e0, _peak = jax.device_get(encode_init(xb, bank))
    # pinned-oracle reference streams, computed ONCE and reused by every
    # flagship check below (each oracle encode is a 512-coef NumPy greedy
    # loop — recomputing identical refs per check wasted minutes)
    refs1 = [
        mp_encode(
            xs[b][:, None], mld.augmented(0), mld.gram(0), num_coefs=512,
            scores0=s0[b], energy0=float(e0[b]),
        )
        for b in range(4)
    ]
    refs8 = [
        mp_encode(
            xs[b][:, None], mld.augmented(0), mld.gram(0), num_coefs=512,
            scores0=s0[b], energy0=float(e0[b]), num_select=8,
        )
        for b in range(4)
    ]
    ok = True
    for b in range(4):
        ok &= streams_equal(pk, refs1[b], b)
    check("pallas fused kernel == pinned oracle (flagship)", ok)

    # ---- 2. XLA path + num_select ----------------------------------------
    dev = mp_encode_jax(xb[0], bank, gram_t, num_coefs=512)
    check("XLA scan path == pinned oracle", streams_equal(jax.device_get(dev), refs1[0]))

    dev4 = mp_encode_jax(xb[0], bank, gram_t, num_coefs=512, num_select=4)
    ref4 = mp_encode(
        xs[0][:, None], mld.augmented(0), mld.gram(0), num_coefs=512,
        scores0=s0[0], energy0=float(e0[0]), num_select=4,
    )
    check("num_select=4 sweeps == pinned oracle", streams_equal(jax.device_get(dev4), ref4))

    # ---- 2b. fused kernel ns=8 sweep-batched accepts (the bench path) -----
    t0 = time.time()
    pk8 = jax.device_get(
        mp_encode_pallas(xb[:4], bank, gram_t, num_coefs=512, num_select=8)
    )
    print(f"pallas ns=8 encode: {time.time()-t0:.1f}s (incl. compile)", flush=True)
    ok = True
    for b in range(4):
        ok &= streams_equal(pk8, refs8[b], b)
    check("pallas ns=8 sweep-batched accepts == pinned oracle", ok)

    # ---- 2c. span-narrow accepts (HSC_TPU_KERNEL_NARROW) ------------------
    t0 = time.time()
    pk8n = jax.device_get(
        mp_encode_pallas(
            xb[:4], bank, gram_t, num_coefs=512, num_select=8,
            narrow_mode="1",
        )
    )
    print(f"pallas ns=8 narrow encode: {time.time()-t0:.1f}s (incl. compile)",
          flush=True)
    ok = True
    for b in range(4):
        ok &= streams_equal(pk8n, refs8[b], b)
    check("pallas ns=8 span-narrow accepts == pinned oracle", ok)

    # (A 2d "barrier firewall" check lived here in round 3: an
    # optimization_barrier as the mul/sub contraction fence instead of the
    # VMEM store/load.  The round-4 hardware run ANSWERED it — Mosaic has no
    # lowering for the primitive inside a TC kernel (NotImplementedError at
    # trace time), so the mode is impossible and was removed.)

    # ---- 2d. fit-span accepts (HSC_TPU_KERNEL_NARROW=fit) ------------------
    # Whole-accept span specialization: each serial accept branches once
    # (lax.cond) on whether its window fits the first 128-lane tile and runs
    # read+update+refresh at that span with the extraction read reused.
    # Interpret mode validates the arithmetic; THIS run validates the Mosaic
    # cond-with-results lowering and the per-span VMEM scheduling.
    t0 = time.time()
    pkfit = jax.device_get(
        mp_encode_pallas(
            xb[:4], bank, gram_t, num_coefs=512, narrow_mode="fit",
        )
    )
    pkfit8 = jax.device_get(
        mp_encode_pallas(
            xb[:4], bank, gram_t, num_coefs=512, num_select=8,
            narrow_mode="fit",
        )
    )
    print(f"pallas fit-span encode: {time.time()-t0:.1f}s (incl. compile)",
          flush=True)
    ok = True
    for b in range(4):
        ok &= streams_equal(pkfit, refs1[b], b)
        ok &= streams_equal(pkfit8, refs8[b], b)
    check("pallas fit-span accepts (ns=1 + ns=8) == pinned oracle", ok)

    # ---- 2e. bitcast rounding fence (HSC_TPU_KERNEL_FENCE=bitcast) ---------
    # THE authority on whether the tpu.bitcast pair through int32 registers
    # survives as a mul/sub contraction fence on hardware (interpret mode
    # cannot tell — if the compiler folds the pair, FMA contraction drifts
    # low residual bits and eventually flips a selection vs these pinned
    # streams).  Only on a pass here may the fence be flipped to default.
    t0 = time.time()
    pkbc = jax.device_get(
        mp_encode_pallas(
            xb[:4], bank, gram_t, num_coefs=512, fence_mode="bitcast",
        )
    )
    pkbc8 = jax.device_get(
        mp_encode_pallas(
            xb[:4], bank, gram_t, num_coefs=512, num_select=8,
            fence_mode="bitcast",
        )
    )
    print(f"pallas bitcast-fence encode: {time.time()-t0:.1f}s "
          f"(incl. compile)", flush=True)
    ok = True
    for b in range(4):
        ok &= streams_equal(pkbc, refs1[b], b)
        ok &= streams_equal(pkbc8, refs8[b], b)
    check("pallas bitcast-fence accepts (ns=1 + ns=8) == pinned oracle", ok)

    # ---- 3+4. hierarchical pipeline + corpus bytes + decode ---------------
    cfg2 = make_test_config(
        counts=(32, 16), scales=(32, 96), num_coefs=(256, 128), block_size=8192
    )
    mld2 = MultilevelDictionary.generate(cfg2, seed=11)
    gen2 = SignalGenerator(mld2, rates=[np.full(32, 2e-3), np.full(16, 5e-4)])
    xs2 = gen2.generate_signals(4, cfg2.block_size, seed=5)
    coder = HierarchicalConvolutionalSparseCoder(mld2)  # pallas on TPU
    t0 = time.time()
    batch = coder.encode_batch(xs2)
    print(f"hierarchical encode: {time.time()-t0:.1f}s (incl. compile)", flush=True)
    ok = True
    for b in range(4):
        refs = oracle_hierarchical_pinned(xs2[b], mld2)
        for level in range(2):
            d, r = batch[b][level], refs[level]
            ok &= (
                np.array_equal(d.positions, r.positions)
                and np.array_equal(d.atoms, r.atoms)
                and np.array_equal(d.codes, r.codes)
                and np.float32(d.scale) == r.scale
            )
    check("hierarchical device streams == pinned oracle (both levels)", ok)

    # ---- 3b. hierarchical ns=8 sweeps (the bench operating point) ---------
    # bench.py's encode_hier_mb_s runs this exact config at num_select=8
    # (round 4); pin both levels' sweep streams — level 1 exercises the
    # K=48 / W=65 / CW=384 multi-tile sweep geometry no flat check covers.
    import dataclasses as _dc

    cfg2s = _dc.replace(cfg2, num_select=8)
    mld2s = MultilevelDictionary(cfg2s, [d.copy() for d in mld2.dicts])
    coder8 = HierarchicalConvolutionalSparseCoder(mld2s)
    t0 = time.time()
    batch8 = coder8.encode_batch(xs2)
    print(f"hierarchical ns=8 encode: {time.time()-t0:.1f}s (incl. compile)",
          flush=True)
    ok = True
    for b in range(4):
        refs = oracle_hierarchical_pinned(xs2[b], mld2s)
        for level in range(2):
            d, r = batch8[b][level], refs[level]
            ok &= (
                np.array_equal(d.positions, r.positions)
                and np.array_equal(d.atoms, r.atoms)
                and np.array_equal(d.codes, r.codes)
                and np.float32(d.scale) == r.scale
            )
    check("hierarchical ns=8 sweep streams == pinned oracle", ok)

    # ---- 3c. sparse init kernel vs dense int8 conv, direct (bitwise) ------
    # Checks 3/3b already route the level-1 init through the sparse event
    # kernel (backend pallas + supported geometry); this pins the kernel's
    # RAW OUTPUT against the dense producer on hardware with no greedy-loop
    # indirection — the first place a recombination/placement bug shows.
    from hsc_tpu.ops.init_kernels import sparse_init_supported

    mp1 = coder.coders[1].mp
    assert mp1.int8_init and sparse_init_supported(
        cfg2.counts[1], cfg2.window_sizes[1], cfg2.channels[1],
        cfg2.num_positions(1),
    )
    enc0 = coder.coders[0].mp.compute_coefficients_batch(
        jnp.asarray(xs2)[:, :, None]
    )
    m_int1 = coder.fmap_int_batched(0)(enc0)
    ev = (enc0.positions, enc0.atoms, enc0.codes, enc0.count)
    t0 = time.time()
    tri_s = jax.device_get(mp1.init_int_batched(m_int1, enc0.scale, ev))
    tri_d = jax.device_get(mp1.init_int_batched(m_int1, enc0.scale))
    print(f"sparse-vs-dense init: {time.time()-t0:.1f}s (incl. compile)",
          flush=True)
    ok = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(tri_s, tri_d)
    )
    check("sparse init kernel triple == dense int8 conv (bitwise)", ok)

    blob_dev = pack_corpus(cfg2, [[(1, batch[b][1])] for b in range(4)])
    blob_ref = pack_corpus(
        cfg2, [[(1, oracle_hierarchical_pinned(xs2[b], mld2)[1])] for b in range(4)]
    )
    check("packed corpus bytes identical", blob_dev == blob_ref)

    # mode pinned: this check targets the ORDERED decode path (the default
    # is 'auto' -> integer since round 5; check 5 covers that mode)
    recon_dev = np.stack(
        [coder.reconstruct(batch[b][1], mode="ordered") for b in range(4)]
    )
    reps = mld2.representations(1)[:, :, None]
    recon_ref = np.stack(
        [mp_decode(batch[b][1], reps, cfg2.block_size)[:, 0] for b in range(4)]
    )
    check("TPU decode bytes == oracle decode bytes", recon_dev.tobytes() == recon_ref.tobytes())

    # batched decode parity with single decode
    recon_b = coder.reconstruct_batch(
        [batch[b][1] for b in range(4)], mode="ordered"
    )
    check("batched decode == per-block decode", recon_b.tobytes() == recon_dev.tobytes())

    # ---- 4b. runtime (P3 level-pipelined) container == serial pack --------
    from hsc_tpu.runtime import CorpusEncoder

    enc_rt = CorpusEncoder(mld2, batch_size=2)
    blob_rt = enc_rt.encode(xs2)
    check(
        "runtime level-pipelined container == serial corpus bytes",
        blob_rt == pack_corpus(cfg2, [[(1, batch[b][1])] for b in range(4)]),
    )

    # ---- 5. integer decode mode (format v2): MXU path == oracle -----------
    from hsc_tpu.oracle.mp import mp_decode_integer, rep_quantize

    rep_q, step = rep_quantize(reps, cfg2.rep_bits)
    int_ref = np.stack(
        [
            mp_decode_integer(batch[b][1], rep_q, step, cfg2.block_size)[:, 0]
            for b in range(4)
        ]
    )
    int_dev = coder.reconstruct_batch(
        [batch[b][1] for b in range(4)], mode="integer"
    )
    check(
        "integer (order-free MXU) decode bytes == oracle",
        int_dev.tobytes() == int_ref.tobytes(),
    )

    # ---- 5b. integer-decode kernel at non-multiple-of-64 buffer heights ---
    # Regression pin for the round-5 silent-corruption bug: W in {33, 48,
    # 59} drive h = roundup(2W, 64) through the previously mis-lowering
    # envelope (h would be 72/96/120 under the old roundup-8 rule); the
    # fixed parity widths (32/64/96) sat entirely in the safe set, which
    # is how the bug survived three rounds.  Kernel vs XLA, bitwise.
    from hsc_tpu.ops.decode import mp_decode_integer_batch_jax
    from hsc_tpu.ops.decode_integer_kernel import mp_decode_integer_pallas

    drng = np.random.default_rng(99)
    ok = True
    t0 = time.time()
    for wdec in (33, 48, 59):
        kdec, ndec, mdec = 24, 3000, 96
        nposd = ndec - wdec + 1
        dpos = drng.integers(0, nposd, (2, mdec)).astype(np.int32)
        datm = drng.integers(0, kdec, (2, mdec)).astype(np.int32)
        dcds = drng.integers(-32767, 32768, (2, mdec)).astype(np.int32)
        dcnt = np.array([mdec, mdec // 2], np.int32)
        dstp = np.float32([1e-4, 2e-4])
        drep = drng.integers(-2047, 2048, (kdec, wdec, 1)).astype(np.int32)
        da = (jnp.asarray(dpos), jnp.asarray(datm), jnp.asarray(dcds),
              jnp.asarray(dcnt), jnp.asarray(dstp), jnp.asarray(drep))
        dk = np.asarray(jax.device_get(mp_decode_integer_pallas(*da, n=ndec)))
        dx = np.asarray(
            jax.device_get(mp_decode_integer_batch_jax(*da, n=ndec))
        )
        ok &= dk.tobytes() == dx.tobytes()
    print(f"odd-W integer decode: {time.time()-t0:.1f}s (incl. compile)",
          flush=True)
    check("integer-decode kernel at W=33/48/59 == XLA path (bitwise)", ok)

    # ---- 6. three-level hierarchy on hardware -----------------------------
    cfg3 = make_test_config(
        counts=(16, 8, 4), scales=(16, 48, 112),
        num_coefs=(128, 64, 32), block_size=4096,
    )
    mld3 = MultilevelDictionary.generate(cfg3, seed=21)
    gen3 = SignalGenerator(
        mld3,
        rates=[np.full(16, 2e-3), np.full(8, 5e-4), np.full(4, 2e-4)],
    )
    xs3 = gen3.generate_signals(2, cfg3.block_size, seed=9)
    coder3 = HierarchicalConvolutionalSparseCoder(mld3)
    t0 = time.time()
    batch3 = coder3.encode_batch(xs3)
    print(f"3-level encode: {time.time()-t0:.1f}s (incl. compile)", flush=True)
    ok = True
    for b in range(2):
        refs = oracle_hierarchical_pinned(xs3[b], mld3)
        for level in range(3):
            d, r = batch3[b][level], refs[level]
            ok &= (
                np.array_equal(d.positions, r.positions)
                and np.array_equal(d.codes, r.codes)
                and np.float32(d.scale) == r.scale
            )
    check("3-level device streams == pinned oracle (all levels)", ok)

    reps3 = mld3.representations(2)[:, :, None]
    rec3_dev = np.stack(
        [coder3.reconstruct(batch3[b][2], mode="ordered") for b in range(2)]
    )
    rec3_ref = np.stack(
        [mp_decode(batch3[b][2], reps3, cfg3.block_size)[:, 0] for b in range(2)]
    )
    check(
        "3-level TPU decode bytes == oracle decode bytes",
        rec3_dev.tobytes() == rec3_ref.tobytes(),
    )

    # ---- 7. wide atom windows (W > 129: proportionally larger left pad) ---
    cfgw = make_test_config(
        counts=(8,), scales=(160,), num_coefs=(24,), block_size=2048
    )
    mldw = MultilevelDictionary.generate(cfgw, seed=44)
    xsw = SignalGenerator(mldw, rates=2e-3).generate_signals(
        2, cfgw.block_size, seed=93
    )
    bankw = jnp.asarray(mldw.augmented(0))
    gtw = jnp.asarray(np.ascontiguousarray(mldw.gram(0).transpose(1, 0, 2)))
    xbw = jnp.asarray(xsw)[:, :, None]
    t0 = time.time()
    pkw = jax.device_get(mp_encode_pallas(xbw, bankw, gtw, num_coefs=24))
    print(f"wide-window encode: {time.time()-t0:.1f}s (incl. compile)", flush=True)
    s0w, e0w, _ = jax.device_get(encode_init(xbw, bankw))
    ok = True
    for b in range(2):
        ref = mp_encode(
            xsw[b][:, None], mldw.augmented(0), mldw.gram(0), num_coefs=24,
            scores0=s0w[b], energy0=float(e0w[b]),
        )
        ok &= streams_equal(pkw, ref, b)
    check("wide-window (W=160) fused kernel == pinned oracle", ok)

    print(f"\n{'ALL CHECKS PASSED' if not FAILURES else 'FAILURES: ' + ', '.join(FAILURES)}")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
