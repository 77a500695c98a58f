"""Per-stage encode breakdown at the flagship config.

Separates the three stages of the device encode (ops/pipeline.py):
  init   — `encode_init_batched` (MXU conv + energies + peaks)
  loop   — `_mp_pallas_stage` (the fused greedy kernel) from fixed init
  pack   — host bit-packing of the emitted streams (native Rice coder)

Each stage is timed in steady state (best of R repeats over NB batches,
device_get'd checksums so the relay's D2H of real data is excluded) so
BASELINE's speed-of-light accounting can attribute the headline encode
rate to the stage that actually bounds it.

Usage: python scripts/bench_encode_stages.py [--batches 8] [--repeats 3]
       [--ns 8] [--platform cpu|tpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--ns", type=int, default=8)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from hsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
    from hsc_tpu.io import pack_corpus
    from hsc_tpu.oracle.mp import LevelStream
    from hsc_tpu.ops.encode import encode_init_batched, quantizer_steps
    from hsc_tpu.ops.mp_kernels import _mp_pallas_stage

    interpret = jax.default_backend() == "cpu"
    if interpret:
        # CPU is a smoke/syntax leg only (interpret-mode kernel): tiny shapes
        cfg = make_test_config(counts=(16,), scales=(16,), num_coefs=(32,))
        B = 4
    else:
        cfg = make_test_config(
            counts=(64,), scales=(32,), block_size=16384, num_coefs=(512,)
        )
        B = 64
    mld = MultilevelDictionary.generate(cfg, seed=7)
    gen = SignalGenerator(mld, rates=2e-3)
    xs = gen.generate_signals(B, cfg.block_size, seed=3)
    xb = jnp.asarray(xs)[:, :, None]
    bank = jnp.asarray(mld.augmented(0))
    gram_t = jnp.asarray(np.ascontiguousarray(mld.gram(0).transpose(1, 0, 2)))
    NB, R = args.batches, args.repeats
    block_mb = B * cfg.block_size * 4 / 1e6

    def best_of(fn):
        fn()  # warm (compile)
        best = float("inf")
        for _ in range(R):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # --- stage 1: init conv ------------------------------------------------
    def run_init():
        outs = [encode_init_batched(xb, bank) for _ in range(NB)]
        jax.device_get([o[2].sum() for o in outs])  # checksum fetch

    t_init = best_of(run_init)

    # --- stage 2: greedy loop from fixed init -------------------------------
    scores0, e0, peak = encode_init_batched(xb, bank)
    scale, inv = quantizer_steps(jax.device_get(peak), cfg.amp_bits)
    scale_d, inv_d = jnp.asarray(scale), jnp.asarray(inv)

    def run_loop():
        encs = [
            _mp_pallas_stage(
                scores0, e0, scale_d, inv_d, bank, gram_t,
                num_coefs=cfg.num_coefs[0], amp_bits=cfg.amp_bits,
                tolerance_snr=None, singleton_weight=1.0,
                n_raw=int(bank.shape[0]), num_select=args.ns,
                interpret=interpret,
            )
            for _ in range(NB)
        ]
        jax.device_get([e.count.sum() for e in encs])

    t_loop = best_of(run_loop)

    # --- stage 3: host bit-pack ---------------------------------------------
    enc = jax.device_get(
        _mp_pallas_stage(
            scores0, e0, scale_d, inv_d, bank, gram_t,
            num_coefs=cfg.num_coefs[0], amp_bits=cfg.amp_bits,
            tolerance_snr=None, singleton_weight=1.0,
            n_raw=int(bank.shape[0]), num_select=args.ns,
            interpret=interpret,
        )
    )
    streams = []
    for b in range(B):
        n = int(enc.count[b])
        streams.append(LevelStream(
            positions=np.asarray(enc.positions[b][:n], np.int32),
            atoms=np.asarray(enc.atoms[b][:n], np.int32),
            codes=np.asarray(enc.codes[b][:n], np.int32),
            scale=np.float32(enc.scale[b]), energy0=0.0, energy_res=0.0,
        ))

    def run_pack():
        for _ in range(NB):
            pack_corpus(cfg, [[(0, s)] for s in streams])

    t_pack = best_of(run_pack)

    out = {
        "batches": NB,
        "ns": args.ns,
        "init_ms_per_batch": round(t_init / NB * 1e3, 2),
        "loop_ms_per_batch": round(t_loop / NB * 1e3, 2),
        "pack_ms_per_batch": round(t_pack / NB * 1e3, 2),
        "loop_mb_s": round(NB * block_mb / t_loop, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
