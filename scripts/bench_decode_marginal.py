"""Marginal-rate decode measurement (BASELINE.md "the relay tax").

Times the integer (format v2) and ordered decode paths at growing block
counts and reports the MARGINAL µs/block between the two largest sizes —
the steady-state per-block cost net of the environment's fixed ~28 ms
dispatch round trip.  Device-side checksum (`.sum()` fetch) keeps the
relay's ~35 MB/s D2H of real waveforms out of the measurement.

Usage: python scripts/bench_decode_marginal.py [--platform tpu]
       [--blocks 256,512,1024,2048] [--mode integer|ordered|both]
       [--kernel on|off]   (integer only: off forces the XLA path)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--blocks", default="256,512,1024,2048")
    ap.add_argument("--mode", default="both",
                    choices=["integer", "ordered", "both"])
    ap.add_argument("--kernel", default="on", choices=["on", "off"])
    args = ap.parse_args()
    os.environ["HSC_TPU_INTEGER_KERNEL"] = args.kernel

    from hsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
    from hsc_tpu.oracle.mp import rep_quantize
    from hsc_tpu.ops.pipeline import encode_batches_pipelined

    cfg = make_test_config(
        counts=(64,), scales=(32,), block_size=16384, num_coefs=(512,)
    )
    mld = MultilevelDictionary.generate(cfg, seed=7)
    gen = SignalGenerator(mld, rates=2e-3)
    B = 64
    xs = gen.generate_signals(B, cfg.block_size, seed=3)
    bank = mld.augmented(0)
    gram_t = np.ascontiguousarray(mld.gram(0).transpose(1, 0, 2))
    xb = jnp.asarray(xs)[:, :, None]
    enc_backend = (
        "pallas" if jax.default_backend() in ("tpu", "axon") else "jax"
    )
    enc = jax.device_get(
        encode_batches_pipelined(
            [xb], jnp.asarray(bank), jnp.asarray(gram_t),
            backend=enc_backend, num_coefs=512,
        )[0]
    )
    rep_q, step = rep_quantize(bank, cfg.rep_bits)
    amp_step = (enc.scale.astype(np.float32) * np.float32(step)).astype(
        np.float32
    )
    sizes = [int(s) for s in args.blocks.split(",")]
    block_mb = cfg.block_size * 4 / 1e6
    out = {"config": "flagship 16k/64-atom/512-coef", "kernel": args.kernel}

    def measure(name, fn, mults):
        times = {}
        for nb, a in mults:
            t0 = time.perf_counter()
            jax.device_get(fn(*a))
            log(f"{name} {nb} blocks compile+run {time.perf_counter()-t0:.1f}s")
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(fn(*a))
                best = min(best, time.perf_counter() - t0)
            times[nb] = best
            log(f"{name} {nb} blocks: {best*1e3:.1f} ms "
                f"({best/nb*1e6:.1f} µs/block gross)")
        n1, n2 = sorted(times)[-2:]
        us = (times[n2] - times[n1]) / (n2 - n1) * 1e6
        out[f"{name}_marginal_us_block"] = round(us, 2)
        out[f"{name}_marginal_mb_s"] = round(block_mb / (us / 1e6), 1)
        log(f"{name} marginal ({n1}->{n2}): {us:.2f} µs/block -> "
            f"{block_mb/(us/1e6):.0f} MB/s")

    def tiled(nb):
        m = -(-nb // B)
        return (
            jnp.asarray(np.tile(enc.positions, (m, 1))[:nb]),
            jnp.asarray(np.tile(enc.atoms, (m, 1))[:nb]),
            jnp.asarray(np.tile(enc.codes, (m, 1))[:nb]),
            jnp.asarray(np.tile(enc.count, m)[:nb]),
        )

    if args.mode in ("integer", "both"):
        from hsc_tpu.ops.decode_integer_kernel import mp_decode_integer_batch

        @jax.jit
        def _int(*a):
            return mp_decode_integer_batch(*a, n=cfg.block_size).sum()

        mults = []
        for nb in sizes:
            p, a, c, n_ = tiled(nb)
            m = -(-nb // B)
            amp = jnp.asarray(np.tile(amp_step, m)[:nb])
            mults.append((nb, (p, a, c, n_, amp, jnp.asarray(rep_q))))
        measure("integer", _int, mults)

    if args.mode in ("ordered", "both") and jax.default_backend() in (
        "tpu", "axon"
    ):
        from hsc_tpu.ops.decode_kernel import mp_decode_pallas

        @jax.jit
        def _ord(*a):
            return mp_decode_pallas.__wrapped__(*a, n=cfg.block_size).sum()

        mults = []
        for nb in sizes:
            p, a, c, n_ = tiled(nb)
            m = -(-nb // B)
            scl = jnp.asarray(np.tile(enc.scale, m)[:nb])
            mults.append((nb, (p, a, c, n_, scl, jnp.asarray(bank))))
        measure("ordered", _ord, mults)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
