"""A/B the fused encoder's accept-path placement (HSC_TPU_KERNEL_ACCEPT).

Runs the flagship encode (bench.py's encode section) once per mode in a
fresh subprocess (the mode is read at trace time, so a process per mode
guarantees a fresh program), and prints a summary table.  Also cross-checks
the emitted streams across modes byte-for-byte.

Usage: python scripts/bench_accept_ab.py [--modes legacy,extract,update,mxu]
"""

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
import numpy as np
from hsc_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
from hsc_tpu.ops.pipeline import encode_batches_pipelined

mode = (
    os.environ["HSC_TPU_KERNEL_ACCEPT"]
    + ":" + os.environ.get("HSC_TPU_KERNEL_SWEEP", "batched")
)
if os.environ.get("HSC_TPU_KERNEL_GROUP_CAP"):
    mode += ":g" + os.environ["HSC_TPU_KERNEL_GROUP_CAP"]
_narrow_env = os.environ.get("HSC_TPU_KERNEL_NARROW", "0")
if _narrow_env == "fit":
    mode += ":fit"
elif _narrow_env not in ("0", "", "off"):
    mode += ":n"
if os.environ.get("HSC_TPU_KERNEL_FENCE", "vmem") == "bitcast":
    mode += ":bc"
cfg = make_test_config(counts=(64,), scales=(32,), block_size=16384, num_coefs=(512,))
mld = MultilevelDictionary.generate(cfg, seed=7)
gen = SignalGenerator(mld, rates=2e-3)
B = 64
xs = gen.generate_signals(B, cfg.block_size, seed=3)
bank = mld.augmented(0)
gram_t = np.ascontiguousarray(mld.gram(0).transpose(1, 0, 2))
xb = jnp.asarray(xs)[:, :, None]
bank_d, gram_d = jnp.asarray(bank), jnp.asarray(gram_t)
NBATCH = 16
batches = [xb] * NBATCH

def run(ns):
    encs = encode_batches_pipelined(
        batches, bank_d, gram_d, backend="pallas", num_coefs=512,
        num_select=ns, window=None,
    )
    return encs

out = {"mode": mode}
ns_list = tuple(
    int(s) for s in os.environ.get("HSC_TPU_AB_NS", "1,8").split(",")
)
for ns in ns_list:
    t0 = time.perf_counter()
    encs = run(ns)
    jax.device_get([e.count for e in encs])
    print(f"[{mode}] ns={ns} compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        encs = run(ns)
        jax.device_get([e.count for e in encs])
        best = min(best, time.perf_counter() - t0)
    mbps = NBATCH * B * cfg.block_size * 4 / 1e6 / best
    out[f"ns{ns}_mb_s"] = round(mbps, 1)
    # stream digest of batch 0 for cross-mode byte-identity
    e = jax.device_get(encs[0])
    import hashlib
    h = hashlib.sha256()
    for a in (e.positions, e.atoms, e.codes, e.count):
        h.update(np.asarray(a).tobytes())
    out[f"ns{ns}_digest"] = h.hexdigest()[:16]
print(json.dumps(out))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--modes",
        default="legacy,extract,update,mxu",
        help="comma list of ACCEPT[:SWEEP[:FLAGS...]] modes — flags: gN"
        " (interleave-group cap N, raising the VMEM budget as needed),"
        " n (span-narrow updates), fit (whole-accept fit-span), bc"
        " (bitcast rounding fence instead of the VMEM firewall)."
        "  E.g. extract:serial:bc",
    )
    args = ap.parse_args()
    results = []
    for mode in args.modes.split(","):
        parts = mode.split(":")
        accept = parts[0]
        sweep = parts[1] if len(parts) > 1 and parts[1] else "batched"
        env = dict(
            os.environ,
            HSC_TPU_KERNEL_ACCEPT=accept,
            HSC_TPU_KERNEL_SWEEP=sweep,
        )
        for flag in parts[2:]:
            if flag.startswith("g") and flag[1:].isdigit():
                gcap = int(flag[1:])
                env["HSC_TPU_KERNEL_GROUP_CAP"] = str(gcap)
                if gcap > 2:
                    # the default 12 MiB budget caps the flagship at group=2
                    env.setdefault("HSC_TPU_KERNEL_VMEM_MB", "52")
            elif flag == "n":
                env["HSC_TPU_KERNEL_NARROW"] = "1"
            elif flag == "fit":
                env["HSC_TPU_KERNEL_NARROW"] = "fit"
            elif flag == "bc":
                env["HSC_TPU_KERNEL_FENCE"] = "bitcast"
            else:
                sys.exit(f"unknown mode flag {flag!r} in {mode!r} "
                         "(expected gN, n, fit, or bc)")
        print(f"=== mode {mode} ===", file=sys.stderr, flush=True)
        p = subprocess.run(
            [sys.executable, "-c", WORKER], env=env, capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stderr.write(p.stderr)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
        try:
            results.append(json.loads(line))
        except json.JSONDecodeError:
            print(f"mode {mode} FAILED:\n{p.stdout}\n{p.stderr}", file=sys.stderr)
    print(json.dumps(results, indent=1))
    ns1 = {r.get("ns1_digest") for r in results}
    ns8 = {r.get("ns8_digest") for r in results}
    print(f"ns1 digests identical: {len(ns1) == 1}; "
          f"ns8 digests identical: {len(ns8) == 1}")


if __name__ == "__main__":
    main()
