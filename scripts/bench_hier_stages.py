"""Per-level, per-stage hierarchical encode breakdown on hardware.

The flat encoder has four rounds of speed-of-light accounting (BASELINE.md);
the hierarchical path — the project's namesake (SURVEY.md §3.4
`HierarchicalConvolutionalSparseCoder.encode`) — had only an end-to-end
number.  This measures the device-MARGINAL cost of every stage of the
level-pipelined hierarchical encode so BASELINE's "hierarchical
speed-of-light" section can name the limiter:

  init_k   — level-k init correlation (`encode_init_batched`; level >= 1
             convolves the K_{k-1}-channel feature map at f32-HIGHEST)
  loop_k   — level-k fused greedy kernel from a fixed init
  fmap_k   — level-k -> k+1 quantized feature-map hand-off
  total    — `encode_hierarchical_batches_pipelined` end to end
  overhead — total - sum(stages): host quantizer steps, drain policy,
             scheduling gaps

Marginal methodology (BASELINE.md "the relay tax"): this environment pays a
fixed ~28 ms dispatch+fetch round trip, so per-dispatch timings overstate
small stages ~5x.  Each stage is timed at two dispatch counts (NB1, NB2)
with ONE tiny device fetch at the end; the difference isolates device
compute (the fixed RTT and the final fetch cancel).

Usage:
  python scripts/bench_hier_stages.py [--config bench|flagship]
      [--nb1 2 --nb2 6] [--repeats 3] [--platform cpu|tpu] [--init-ab]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


CONFIGS = {
    # the bench.py hierarchical operating point (rounds 3-4 record)
    "bench": dict(
        counts=(32, 16), scales=(32, 96), block_size=8192,
        num_coefs=(256, 128), num_select=8,
    ),
    # flagship-scale hierarchy (VERDICT r4 #1): level 0 = the flat flagship
    # geometry (K=64, W=32, 16k blocks), plus a real level 1
    "flagship": dict(
        counts=(64, 32), scales=(32, 96), block_size=16384,
        num_coefs=(512, 192), num_select=8,
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="bench", choices=sorted(CONFIGS))
    ap.add_argument("--nb1", type=int, default=2)
    ap.add_argument("--nb2", type=int, default=6)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--init-ab", action="store_true",
                    help="also time the level inits at DEFAULT precision "
                    "(measurement only — quantifies the f32-HIGHEST tax on "
                    "the channel-rich level-1 conv)")
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from hsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
    from hsc_tpu.models import HierarchicalConvolutionalSparseCoder
    from hsc_tpu.ops.encode import encode_init_batched, quantizer_steps
    from hsc_tpu.ops.pipeline import encode_hierarchical_batches_pipelined

    on_tpu = jax.default_backend() != "cpu"
    spec = dict(CONFIGS[args.config])
    B = args.batch
    if not on_tpu:
        # CPU smoke leg: tiny shapes, interpret-free jax backend
        spec = dict(counts=(8, 4), scales=(8, 24), block_size=512,
                    num_coefs=(16, 8), num_select=1)
        B = 4
    cfg = make_test_config(**spec)
    mld = MultilevelDictionary.generate(cfg, seed=9)
    gen = SignalGenerator(mld, rates=2e-3)
    xs = gen.generate_signals(B, cfg.block_size, seed=5)
    xb = jnp.asarray(xs)[:, :, None]
    coder = HierarchicalConvolutionalSparseCoder(
        mld, backend="pallas" if on_tpu else "jax"
    )
    NB1, NB2, R = args.nb1, args.nb2, args.repeats
    batch_mb = B * cfg.block_size * 4 / 1e6

    def marginal(fn):
        """Best-of-R marginal ms/dispatch between NB1 and NB2 dispatches."""
        fn(NB1)  # warm (compile)
        t1 = t2 = float("inf")
        for _ in range(R):
            t0 = time.perf_counter()
            fn(NB1)
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            fn(NB2)
            t2 = min(t2, time.perf_counter() - t0)
        return (t2 - t1) / (NB2 - NB1) * 1e3

    out = {"config": args.config, "spec": {k: list(v) if isinstance(v, tuple)
           else v for k, v in spec.items()}, "batch": B,
           "nb": [NB1, NB2], "platform": "tpu" if on_tpu else "cpu"}
    stages_ms = 0.0

    # Per-level inputs: run the real hand-off chain once on device.
    # hier_init='int8' levels carry (int32 map, scales) instead of f32 maps.
    level_inputs = [xb]
    encs = []
    for level in range(cfg.num_levels):
        mp = coder.coders[level].mp
        if mp.int8_init:
            s0, e0, peak = mp.init_int_batched(*level_inputs[level])
        else:
            s0, e0, peak = encode_init_batched(level_inputs[level], mp.bank)
        scale, inv = quantizer_steps(
            np.asarray(jax.device_get(peak)), mp.settings["amp_bits"]
        )
        enc = mp.loop_stage(s0, e0, scale, inv)
        encs.append(enc)
        if level + 1 < cfg.num_levels:
            if coder.coders[level + 1].mp.int8_init:
                level_inputs.append(
                    (
                        coder.fmap_int_batched(level)(enc),
                        enc.scale,
                        (enc.positions, enc.atoms, enc.codes, enc.count),
                    )
                )
            else:
                level_inputs.append(coder.fmap_batched(level)(enc))

        # --- init_k: MXU correlation over this level's input ---------------
        xin = level_inputs[level]

        if mp.int8_init:

            def run_init(nb, xin=xin, mp=mp):
                outs = [mp.init_int_batched(*xin) for _ in range(nb)]
                jax.device_get(outs[-1][2])  # tiny [B] peak fetch

        else:

            def run_init(nb, xin=xin, bank=mp.bank):
                outs = [encode_init_batched(xin, bank) for _ in range(nb)]
                jax.device_get(outs[-1][2])  # tiny [B] peak fetch

        m_init = marginal(run_init)

        # --- loop_k: fused greedy kernel from this level's fixed init ------
        scale_d, inv_d = jnp.asarray(scale), jnp.asarray(inv)

        def run_loop(nb, mp=mp, s0=s0, e0=e0, scale_d=scale_d, inv_d=inv_d):
            outs = [mp.loop_stage(s0, e0, scale_d, inv_d) for _ in range(nb)]
            jax.device_get(outs[-1].count)

        m_loop = marginal(run_loop)

        lvl = {
            "init_ms": round(m_init, 2),
            "loop_ms": round(m_loop, 2),
            "K": int(mp.bank.shape[0]),
            "W": int(mp.bank.shape[1]),
            "C": int(mp.bank.shape[2]),
            "npos": int(s0.shape[2]),
            "num_coefs": cfg.num_coefs[level],
        }
        stages_ms += m_init + m_loop

        # --- fmap_k: hand-off map (levels below the top) --------------------
        if level + 1 < cfg.num_levels:
            if coder.coders[level + 1].mp.int8_init:
                fmap = coder.fmap_int_batched(level)
            else:
                fmap = coder.fmap_batched(level)

            def run_fmap(nb, fmap=fmap, enc=enc):
                outs = [fmap(enc) for _ in range(nb)]
                jax.device_get(outs[-1][:, 0, 0])

            m_fmap = marginal(run_fmap)
            lvl["fmap_ms"] = round(m_fmap, 2)
            stages_ms += m_fmap

        if args.init_ab:
            # default-precision conv (bf16 products): NOT spec arithmetic —
            # quantifies what f32-HIGHEST costs at this level's channel count
            import jax.numpy as _jnp
            from jax import lax

            bank = mp.bank
            if isinstance(xin, tuple):  # int8 levels: rebuild the f32 map
                xin = xin[0].astype(jnp.float32) * xin[1][:, None, None]

            @jax.jit
            def init_fast(x, bank=bank):
                lhs = x.astype(_jnp.float32).transpose(0, 2, 1)
                rhs = bank.transpose(0, 2, 1)
                o = lax.conv_general_dilated(
                    lhs, rhs, (1,), "VALID",
                    dimension_numbers=("NCH", "OIH", "NCH"),
                    preferred_element_type=_jnp.float32,
                )
                return o

            def run_fast(nb, xin=xin):
                outs = [init_fast(xin) for _ in range(nb)]
                jax.device_get(outs[-1][:, 0, 0])

            lvl["init_default_precision_ms"] = round(marginal(run_fast), 2)

        out[f"level{level}"] = lvl

    # --- total: the production level-pipelined path -------------------------
    def run_total(nb):
        outs = encode_hierarchical_batches_pipelined([xb] * nb, coder)
        jax.device_get([e.count for e in outs[-1]])

    m_total = marginal(run_total)
    out["total_ms_per_batch"] = round(m_total, 2)
    out["stages_sum_ms"] = round(stages_ms, 2)
    out["overhead_ms"] = round(m_total - stages_ms, 2)
    out["hier_mb_s_marginal"] = round(batch_mb / (m_total / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
