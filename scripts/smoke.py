"""Pre-commit smoke gate — ~20 s of critical-path checks on CPU.

Run this before EVERY commit (CLAUDE.md rule, VERDICT r3 item 4: a round-3
snapshot landed a kernel-signature change without its dispatch site and
broke HEAD).  It traces the fused Pallas kernel through its real dispatch
(`mp_encode_pallas` -> `_mp_pallas_stage` -> `functools.partial(_mp_kernel)`)
so a signature/dispatch mismatch fails HERE, not in the driver's bench.

Checks:
  1. Pallas interpret encode (default modes) bitwise vs the XLA path.
  2. Container pack -> unpack -> decode round trip, both decode modes,
     decode bitwise vs the NumPy oracle.
  3. bench.py imports and its kernel entry points resolve.

Exit 0 = safe to commit.  This is NOT the full suite (286+ tests, ~4 min)
nor hardware parity (scripts/check_tpu_parity.py) — it is the fast gate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main() -> int:
    t_start = time.perf_counter()
    from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
    from hsc_tpu.ops import mp_encode_jax
    from hsc_tpu.ops.mp_kernels import mp_encode_pallas

    cfg = make_test_config()
    mld = MultilevelDictionary.generate(cfg, seed=7)
    gen = SignalGenerator(mld, rates=4e-3)
    xs = gen.generate_signals(2, cfg.block_size, seed=3)
    bank = jnp.asarray(mld.augmented(0))
    gram_t = jnp.asarray(np.ascontiguousarray(mld.gram(0).transpose(1, 0, 2)))
    xb = jnp.asarray(xs)[:, :, None]
    nc = cfg.num_coefs[0]

    # -- 1. fused kernel through its production dispatch (interpret mode) ---
    pk = mp_encode_pallas(xb, bank, gram_t, num_coefs=nc, interpret=True)
    for b in range(2):
        ref = mp_encode_jax(xb[b], bank, gram_t, num_coefs=nc)
        for fld in ("positions", "atoms", "codes", "count", "scale"):
            np.testing.assert_array_equal(
                np.asarray(getattr(pk, fld)[b]), np.asarray(getattr(ref, fld))
            )
    print(f"[smoke] 1/4 pallas dispatch + bitwise vs XLA ok "
          f"({time.perf_counter() - t_start:.1f}s)", flush=True)

    # -- 1b. sparse int8 init kernel through its production dispatch --------
    # (init_int_batched(..., events) -> ops.init_kernels -> shared assemble;
    # a kernel-signature/dispatch mismatch must fail HERE, not on hardware)
    from hsc_tpu.config import CodecConfig
    from hsc_tpu.models.coder import HierarchicalConvolutionalSparseCoder
    from hsc_tpu.ops.init_kernels import sparse_init_supported

    hcfg = CodecConfig(counts=(12, 6), scales=(12, 18), block_size=512,
                       num_coefs=(40, 24), num_select=1)
    assert hcfg.hier_init == "int8"
    assert sparse_init_supported(
        hcfg.counts[1], hcfg.window_sizes[1], hcfg.channels[1],
        hcfg.num_positions(1),
    )
    hmld = MultilevelDictionary.generate(hcfg, seed=7)
    hx = np.random.default_rng(5).standard_normal(
        (2, hcfg.block_size)).astype(np.float32)
    # the sparse kernel is opt-in (dense int8 conv is the production init —
    # BASELINE); force it on so its dispatch chain is traced pre-commit
    os.environ["HSC_TPU_SPARSE_INIT"] = "1"
    hw = HierarchicalConvolutionalSparseCoder(hmld, backend="pallas_interpret")
    hj = HierarchicalConvolutionalSparseCoder(hmld, backend="jax")
    for gb, wb in zip(hw.encode_batch(hx), hj.encode_batch(hx)):
        for g, w in zip(gb, wb):
            np.testing.assert_array_equal(g.positions, w.positions)
            np.testing.assert_array_equal(g.codes, w.codes)
            assert np.float32(g.scale) == np.float32(w.scale)
    os.environ.pop("HSC_TPU_SPARSE_INIT", None)
    print(f"[smoke] 2/4 sparse init kernel dispatch + hier bitwise ok "
          f"({time.perf_counter() - t_start:.1f}s)", flush=True)

    # -- 2. container round trip + oracle-bitwise decode, both modes --------
    import dataclasses

    from hsc_tpu.io import unpack_corpus
    from hsc_tpu.oracle import mp_decode
    from hsc_tpu.oracle.mp import mp_decode_integer, rep_quantize
    from hsc_tpu.runtime import CorpusEncoder

    for decode_mode in ("ordered", "integer"):
        cfg_m = dataclasses.replace(cfg, decode_mode=decode_mode)
        mld_m = MultilevelDictionary(cfg_m, mld.dicts)
        enc = CorpusEncoder(mld_m, backend="jax", batch_size=2)
        blob = enc.encode(xs)
        cfg_u, blocks = unpack_corpus(blob)
        assert cfg_u == cfg_m and len(blocks) == len(xs)
        got = enc.decode(blob)
        bank_np = np.asarray(mld.augmented(0))
        for b, block in enumerate(blocks):
            (_, stream), = block
            if decode_mode == "integer":
                rep_q, step = rep_quantize(bank_np, cfg.rep_bits)
                want = mp_decode_integer(stream, rep_q, step, cfg.block_size)
            else:
                want = mp_decode(stream, bank_np, cfg.block_size)
            np.testing.assert_array_equal(
                np.asarray(got[b]).reshape(-1),
                np.asarray(want).astype(got.dtype).reshape(-1),
            )
    print(f"[smoke] 3/4 container round trip + oracle decode ok "
          f"({time.perf_counter() - t_start:.1f}s)", flush=True)

    # -- 3. bench entry points resolve (no run — just the import surface) ---
    import importlib

    for mod in (
        "hsc_tpu.ops.pipeline",
        "hsc_tpu.ops.decode_integer_kernel",
        "hsc_tpu.ops.decode_kernel",
        "hsc_tpu.learn.kmeans",
    ):
        importlib.import_module(mod)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__  # noqa: F401  (driver entry must stay importable)
    import bench  # noqa: F401

    print(f"[smoke] 4/4 bench/graft import surface ok "
          f"({time.perf_counter() - t_start:.1f}s)", flush=True)
    print(f"[smoke] PASS in {time.perf_counter() - t_start:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
