"""Randomized HARDWARE parity fuzz: random codec geometries encoded by the
compiled Pallas kernel on the real chip, bitwise vs the pinned NumPy oracle.

The test suite fuzzes geometry in interpret mode (tests/test_fuzz.py,
test_pallas.py), which cannot see Mosaic lowering/tiling bugs — both kernel
corners found on hardware (K%8 sublane padding, fold==1 lpad>l8 refresh
no-op) were invisible to interpret mode.  scripts/check_tpu_parity.py pins
FIXED configs; this script samples NEW geometries per seed so every run
extends hardware coverage.  Each shape costs one remote compile (1-10 min
cold), so the default is a small number of shapes; the compilation cache
makes repeat runs of the same --base-seed cheap.

  python scripts/fuzz_tpu_parity.py --shapes 4 --base-seed 0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hsc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hsc_tpu import (  # noqa: E402
    MultilevelDictionary,
    SignalGenerator,
    make_test_config,
)
from hsc_tpu.ops.encode import encode_init_batched as encode_init  # noqa: E402
from hsc_tpu.ops.mp_kernels import (  # noqa: E402
    mp_encode_pallas,
    pallas_num_select_options,
)
from hsc_tpu.oracle.mp import mp_encode  # noqa: E402


def sample_shape(rng: np.random.Generator) -> dict:
    """One random geometry, weighted toward the zones that have bitten:
    non-multiple-of-8 atom counts, wide windows, short blocks, sweep folds."""
    wide = rng.random() < 0.25
    if wide:
        w = int(rng.integers(130, 200))
        block = int(rng.integers(w * 2, w * 8))
    else:
        w = int(rng.integers(6, 80))
        block = int(rng.integers(max(w * 4, 512), 12288))
    k = int(rng.integers(3, 96))
    nc = int(rng.integers(8, 160))
    amp_bits = int(rng.integers(8, 17))
    tol = float(rng.uniform(4.0, 18.0)) if rng.random() < 0.3 else None
    return dict(
        counts=(k,), scales=(w,), block_size=block, num_coefs=(nc,),
        amp_bits=amp_bits, tolerance_snr=tol,
    )


def run_shape(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    kw = sample_shape(rng)
    cfg = make_test_config(**kw)
    mld = MultilevelDictionary.generate(cfg, seed=seed + 17)
    gen = SignalGenerator(mld, rates=float(rng.uniform(1e-3, 1e-2)))
    xs = gen.generate_signals(2, cfg.block_size, seed=seed)
    bank = jnp.asarray(mld.augmented(0))
    gram_t = jnp.asarray(
        np.ascontiguousarray(mld.gram(0).transpose(1, 0, 2))
    )
    xb = jnp.asarray(xs)[:, :, None]
    npos = cfg.num_positions(0)
    w = cfg.window_sizes[0]
    ns = int(rng.choice(pallas_num_select_options(npos, w)))

    t0 = time.time()
    pk = jax.device_get(
        mp_encode_pallas(
            xb, bank, gram_t,
            num_coefs=cfg.num_coefs[0], amp_bits=cfg.amp_bits,
            tolerance_snr=cfg.tolerance_snr, num_select=ns,
            singleton_weight=0.9, n_raw=max(bank.shape[0] - 2, 1),
        )
    )
    dt = time.time() - t0
    s0, e0, _ = jax.device_get(encode_init(xb, bank))
    ok = True
    for b in range(2):
        ref = mp_encode(
            xs[b][:, None], mld.augmented(0), mld.gram(0),
            num_coefs=cfg.num_coefs[0], amp_bits=cfg.amp_bits,
            tolerance_snr=cfg.tolerance_snr, num_select=ns,
            singleton_weight=0.9, n_raw=max(bank.shape[0] - 2, 1),
            scores0=s0[b], energy0=float(e0[b]),
        )
        n = int(pk.count[b])
        ok &= (
            n == ref.positions.shape[0]
            and np.array_equal(np.asarray(pk.positions[b][:n]), ref.positions)
            and np.array_equal(np.asarray(pk.atoms[b][:n]), ref.atoms)
            and np.array_equal(np.asarray(pk.codes[b][:n]), ref.codes)
            and np.float32(pk.scale[b]) == ref.scale
        )
    return dict(
        seed=seed, ok=bool(ok), compile_run_s=round(dt, 1), ns=ns,
        k=kw["counts"][0], w=kw["scales"][0], block=kw["block_size"],
        nc=kw["num_coefs"][0], amp_bits=kw["amp_bits"],
        tol=kw["tolerance_snr"],
    )


def sample_hier_shape(rng: np.random.Generator) -> dict:
    """Random 2-level geometry: level-1 windows cover several level-0
    scales (the reference's atoms-of-atoms structure), counts include
    non-multiple-of-8 zones (Mosaic sublane padding)."""
    w0 = int(rng.integers(8, 48))
    w1_factor = int(rng.integers(2, 5))
    k0 = int(rng.integers(4, 48))
    k1 = int(rng.integers(3, 24))
    block = int(rng.integers(w0 * w1_factor * 8, 8192))
    nc0 = int(rng.integers(16, 128))
    nc1 = int(rng.integers(8, max(nc0 // 2, 9)))
    return dict(
        counts=(k0, k1), scales=(w0, w0 * w1_factor),
        block_size=block, num_coefs=(nc0, nc1),
        amp_bits=int(rng.integers(8, 17)),
    )


def run_hier_shape(seed: int) -> dict:
    """Random 2-level hierarchy through the device coder (fused kernel per
    level + int8-digit feature-map hand-off), both levels bitwise vs the
    pinned oracle."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from pinned import oracle_hierarchical_pinned

    from hsc_tpu.models import HierarchicalConvolutionalSparseCoder

    rng = np.random.default_rng(seed)
    kw = sample_hier_shape(rng)
    cfg = make_test_config(**kw)
    ns_common = set(
        pallas_num_select_options(cfg.num_positions(0), cfg.window_sizes[0])
    ) & set(
        pallas_num_select_options(cfg.num_positions(1), cfg.window_sizes[1])
    )
    ns = int(rng.choice(sorted(ns_common)))
    if ns > 1:
        import dataclasses

        cfg = dataclasses.replace(cfg, num_select=ns)
    mld = MultilevelDictionary.generate(cfg, seed=seed + 23)
    gen = SignalGenerator(mld, rates=float(rng.uniform(2e-3, 1e-2)))
    xs = gen.generate_signals(2, cfg.block_size, seed=seed)
    coder = HierarchicalConvolutionalSparseCoder(mld)  # pallas on TPU
    t0 = time.time()
    batch = coder.encode_batch(xs)
    dt = time.time() - t0
    ok = True
    for b in range(2):
        refs = oracle_hierarchical_pinned(xs[b], mld)
        for level in range(cfg.num_levels):
            d, r = batch[b][level], refs[level]
            ok &= (
                np.array_equal(np.asarray(d.positions), r.positions)
                and np.array_equal(np.asarray(d.atoms), r.atoms)
                and np.array_equal(np.asarray(d.codes), r.codes)
                and np.float32(d.scale) == r.scale
            )
    return dict(
        seed=seed, ok=bool(ok), compile_run_s=round(dt, 1), ns=ns,
        counts=kw["counts"], scales=kw["scales"], block=kw["block_size"],
        nc=kw["num_coefs"], amp_bits=kw["amp_bits"], hier=True,
    )


def run_container_shape(seed: int) -> dict:
    """Random geometry through the FULL container path on chip (VERDICT r4
    #7): TPU encode -> pack (entropy / distributed / CBR sampled) ->
    TPU decode AND subprocess CPU decode of the same container — decode
    byte-identity across backends is the format's core contract, here
    under random geometries instead of the parity script's fixed ones.
    Also asserts re-encode determinism (same container bytes twice)."""
    import subprocess
    import tempfile

    from hsc_tpu.runtime import CorpusEncoder

    rng = np.random.default_rng(seed)
    two_level = rng.random() < 0.5
    kw = sample_hier_shape(rng) if two_level else sample_shape(rng)
    kw.pop("tolerance_snr", None)
    entropy = str(rng.choice(["fixed", "rice"]))
    cfg = make_test_config(**kw, entropy=entropy)
    distributed = bool(two_level and rng.random() < 0.5)
    # CBR sampled: None / per-block / corpus at a truncating-ish rate
    mode_pick = rng.random()
    target_bps, rate_mode = None, "block"
    if mode_pick < 0.4:
        target_bps = float(rng.uniform(0.2, 1.5))
        rate_mode = "corpus" if rng.random() < 0.5 else "block"
    # some sampled geometries cannot generate a dictionary (the coherence
    # rejection sampler exhausts, e.g. many atoms over a tiny window) —
    # deterministically resample the shape rather than abort the sweep
    for attempt in range(8):
        try:
            mld = MultilevelDictionary.generate(cfg, seed=seed + 31)
            break
        except RuntimeError:
            two_level = rng.random() < 0.5
            kw = sample_hier_shape(rng) if two_level else sample_shape(rng)
            kw.pop("tolerance_snr", None)
            cfg = make_test_config(**kw, entropy=entropy)
    else:
        return dict(seed=seed, ok=False, err="no generatable geometry",
                    container=True)
    gen = SignalGenerator(mld, rates=float(rng.uniform(2e-3, 8e-3)))
    xs = gen.generate_signals(3, cfg.block_size, seed=seed)
    enc = CorpusEncoder(
        mld, batch_size=3, distributed=distributed,
        target_bps=target_bps, rate_mode=rate_mode,
    )
    use_index = bool(rng.random() < 0.5)
    t0 = time.time()
    try:
        blob = enc.encode(xs, index=use_index)
    except ValueError as e:
        if target_bps is not None and "floor" in str(e):
            # sampled rate below the empty-stream floor — resample as VBR
            enc = CorpusEncoder(mld, batch_size=3, distributed=distributed)
            target_bps, rate_mode = None, "block"
            blob = enc.encode(xs, index=use_index)
        else:
            raise
    det = enc.encode(xs, index=use_index) == blob
    dec_tpu = enc.decode(blob)
    dt = time.time() - t0
    with tempfile.TemporaryDirectory() as td:
        mld.save(os.path.join(td, "d.npz"))
        with open(os.path.join(td, "c.hsct"), "wb") as f:
            f.write(blob)
        r = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "hsc_codec.py"),
                "decode", "--dict", os.path.join(td, "d.npz"),
                "--input", os.path.join(td, "c.hsct"),
                "--output", os.path.join(td, "r.npy"),
                "--backend", "jax", "--platform", "cpu",
            ],
            capture_output=True, text=True, timeout=900,
        )
        if r.returncode != 0:
            return dict(seed=seed, ok=False, err=r.stderr[-400:],
                        container=True)
        dec_cpu = np.load(os.path.join(td, "r.npy"))
    ok = bool(
        det
        and dec_cpu.shape == dec_tpu.shape
        and dec_cpu.tobytes() == np.asarray(dec_tpu).tobytes()
    )
    return dict(
        seed=seed, ok=ok, compile_run_s=round(dt, 1),
        counts=kw["counts"], scales=kw["scales"], block=kw["block_size"],
        entropy=entropy, distributed=distributed,
        target_bps=None if target_bps is None else round(target_bps, 3),
        rate_mode=rate_mode, container=True,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shapes", type=int, default=4)
    ap.add_argument("--base-seed", type=int, default=0)
    ap.add_argument("--hierarchical", action="store_true",
                    help="fuzz random 2-level hierarchies (fused kernel per "
                    "level + feature-map hand-off) instead of single-level")
    ap.add_argument("--container", action="store_true",
                    help="fuzz the full container path (pack -> TPU decode "
                    "== subprocess CPU decode byte-identity) with entropy, "
                    "--distributed and --target-bps/rate-mode sampled")
    args = ap.parse_args()
    results = []
    for i in range(args.shapes):
        if args.container:
            run = run_container_shape
        elif args.hierarchical:
            run = run_hier_shape
        else:
            run = run_shape
        r = run(args.base_seed * 1000 + i)
        results.append(r)
        print(json.dumps(r), flush=True)
    n_ok = sum(r["ok"] for r in results)
    what = ("container decode byte-identity" if args.container
            else "shapes bitwise vs pinned oracle")
    print(f"{n_ok}/{len(results)} {what}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
