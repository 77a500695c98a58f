"""Manual parity check on the real TPU chip (run with default JAX_PLATFORMS).

Verifies the two cross-backend contracts of SURVEY.md §7 H2 on hardware:
  1. encode: the TPU greedy loop emits the oracle's exact event stream;
  2. decode: TPU reconstruction bytes == oracle reconstruction bytes.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
from hsc_tpu.oracle import mp_decode, mp_encode
from hsc_tpu.ops import mp_decode_jax, mp_encode_jax

print("devices:", jax.devices())

cfg = make_test_config(counts=(64,), scales=(32,), block_size=16384, num_coefs=(512,))
mld = MultilevelDictionary.generate(cfg, seed=7)
gen = SignalGenerator(mld, rates=2e-3)
sig = gen.generate_signals(1, cfg.block_size, seed=3)[0]
bank = mld.augmented(0)
gram_t = np.ascontiguousarray(mld.gram(0).transpose(1, 0, 2))

t0 = time.time()
ref = mp_encode(sig[:, None], bank, mld.gram(0), num_coefs=cfg.num_coefs[0])
print(f"oracle encode: {time.time()-t0:.3f}s, {ref.positions.shape[0]} events, snr {ref.snr_db():.2f} dB")

xb = jnp.asarray(sig)[:, None]
bb = jnp.asarray(bank)
gb = jnp.asarray(gram_t)
t0 = time.time()
dev = mp_encode_jax(xb, bb, gb, num_coefs=cfg.num_coefs[0])
dev.count.block_until_ready()
print(f"tpu encode (compile+run): {time.time()-t0:.3f}s")
t0 = time.time()
dev = mp_encode_jax(xb, bb, gb, num_coefs=cfg.num_coefs[0])
dev.count.block_until_ready()
print(f"tpu encode (run): {time.time()-t0:.3f}s")

n = int(dev.count)
ok_n = n == ref.positions.shape[0]
print(f"count match: {ok_n} ({n} vs {ref.positions.shape[0]})")
m = min(n, ref.positions.shape[0])
pos_eq = np.array_equal(np.asarray(dev.positions[:m]), ref.positions[:m])
atm_eq = np.array_equal(np.asarray(dev.atoms[:m]), ref.atoms[:m])
cod_eq = np.array_equal(np.asarray(dev.codes[:m]), ref.codes[:m])
print(f"stream match: pos={pos_eq} atom={atm_eq} code={cod_eq} scale={np.float32(dev.scale)==ref.scale}")
if not (pos_eq and atm_eq and cod_eq):
    dp = np.nonzero(np.asarray(dev.positions[:m]) != ref.positions[:m])[0]
    dc = np.nonzero(np.asarray(dev.codes[:m]) != ref.codes[:m])[0]
    print("first pos mismatch:", dp[:5], "first code mismatch:", dc[:5])
    i = int(min(list(dp[:1]) + list(dc[:1]) + [m]))
    print("around idx", i, "ref:", ref.positions[i], ref.atoms[i], ref.codes[i],
          "dev:", int(dev.positions[i]), int(dev.atoms[i]), int(dev.codes[i]))

# decode parity
oracle_recon = mp_decode(ref, bank, cfg.block_size)
pad = cfg.num_coefs[0]
pos = np.zeros(pad, np.int32); pos[: ref.positions.shape[0]] = ref.positions
atm = np.zeros(pad, np.int32); atm[: ref.atoms.shape[0]] = ref.atoms
cds = np.zeros(pad, np.int32); cds[: ref.codes.shape[0]] = ref.codes
t0 = time.time()
dev_recon = np.asarray(
    mp_decode_jax(
        jnp.asarray(pos), jnp.asarray(atm), jnp.asarray(cds),
        jnp.int32(ref.positions.shape[0]), jnp.float32(ref.scale), bb,
        n=cfg.block_size,
    )
)
print(f"tpu decode (compile+run): {time.time()-t0:.3f}s")
bit_exact = dev_recon.tobytes() == oracle_recon.tobytes()
print(f"DECODE BIT-EXACT: {bit_exact}")
if not bit_exact:
    d = np.abs(dev_recon - oracle_recon)
    print("mismatched:", int(np.sum(dev_recon != oracle_recon)), "maxdiff:", float(d.max()))
print("ALL OK" if (ok_n and pos_eq and atm_eq and cod_eq and bit_exact) else "PARITY FAILURE")
