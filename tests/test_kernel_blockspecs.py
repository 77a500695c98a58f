"""Static Mosaic tiling validation of every Pallas kernel's BlockSpecs.

The TPU lowering requires a BlockSpec's last two dims to divide (8, 128)
or EQUAL the corresponding array dims — and interpret mode does NOT
enforce this, so a violation passes the whole CPU suite and fails only on
the chip (it bit the integer-decode kernel: per-block ``(1, M)`` event
slices over ``[B, M]`` arrays compile nowhere for B > 1; see
docs/DESIGN.md "Mosaic constraints").  This test traces each kernel entry
point at several geometries and applies the rule to every block mapping
in the jaxpr, replicating the check in
``jax._src.pallas.mosaic.lowering._check_block_mappings`` for fp32/int32
operands (sublane tile 8; int8 operands tile at 32 sublanes, so 8-divisible
blocks remain the conservative common denominator we enforce).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsc_tpu.ops import decode_integer_kernel as dik
from hsc_tpu.ops import decode_kernel as dk
from hsc_tpu.ops import mp_kernels as mpk


def _pallas_block_mappings(jaxpr):
    """Yield (block_shape, array_shape) for every pallas_call in `jaxpr`."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            gm = eqn.params["grid_mapping"]
            for bm in gm.block_mappings:
                block = tuple(
                    getattr(b, "block_size", b) for b in bm.block_shape
                )
                yield block, tuple(bm.array_aval.shape)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                yield from _pallas_block_mappings(v.jaxpr)


def _assert_tiling_ok(jaxpr, label):
    found = 0
    for block, array in _pallas_block_mappings(jaxpr):
        found += 1
        if len(block) < 2:
            continue  # scalars: no lane/sublane tiling
        for dim, tile in ((-2, 8), (-1, 128)):
            b, a = block[dim], array[dim]
            assert b % tile == 0 or b == a, (
                f"{label}: block {block} over array {array} — dim {dim} "
                f"size {b} neither divides {tile} nor equals the array "
                f"dim {a}; this compiles in interpret mode but fails "
                "Mosaic lowering on hardware"
            )
    assert found > 0, f"{label}: no pallas_call found (dispatch changed?)"


@pytest.mark.parametrize("b,m,k,w,n", [
    (4, 128, 16, 16, 1024),     # the geometry that failed on hardware
    (8, 256, 64, 32, 16384),    # flagship
    (2, 128, 28, 24, 4096),     # odd K (sublane-padded path)
])
def test_integer_decode_blockspecs(b, m, k, w, n):
    jaxpr = jax.make_jaxpr(
        lambda p, a, c, cnt, s, r: dik.mp_decode_integer_pallas(
            p, a, c, cnt, s, r, n=n
        )
    )(
        jnp.zeros((b, m), jnp.int32), jnp.zeros((b, m), jnp.int32),
        jnp.zeros((b, m), jnp.int32), jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.float32), jnp.zeros((k, w, 1), jnp.int32),
    )
    _assert_tiling_ok(jaxpr.jaxpr, f"integer decode b={b}")


@pytest.mark.parametrize("b,m,k,w,n", [
    (4, 64, 16, 16, 1024),
    (64, 512, 64, 32, 16384),   # flagship
])
def test_ordered_decode_blockspecs(b, m, k, w, n):
    jaxpr = jax.make_jaxpr(
        lambda p, a, c, cnt, s, r: dk.mp_decode_pallas(
            p, a, c, cnt, s, r, n=n
        )
    )(
        jnp.zeros((b, m), jnp.int32), jnp.zeros((b, m), jnp.int32),
        jnp.zeros((b, m), jnp.int32), jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.float32), jnp.zeros((k, w, 1), jnp.float32),
    )
    _assert_tiling_ok(jaxpr.jaxpr, f"ordered decode b={b}")


@pytest.mark.parametrize("k,w,n,ns", [
    (64, 32, 16384, 8),   # flagship
    (64, 32, 16384, 1),
    (28, 24, 4096, 1),    # odd K (sublane-padded path)
])
def test_encoder_blockspecs(k, w, n, ns):
    b = 4
    npos = n - w + 1
    assert ns in mpk.pallas_num_select_options(npos, w)
    scores0 = jnp.zeros((b, k, npos), jnp.float32)
    e0 = jnp.zeros((b,), jnp.float32)
    sc = jnp.ones((b,), jnp.float32)
    bank = jnp.zeros((k, w, 1), jnp.float32)
    gram_t = jnp.zeros((k, k, 2 * w - 1), jnp.float32)

    def run(scores0, e0, scale, inv, bank, gram_t):
        return mpk._mp_pallas_stage(
            scores0, e0, scale, inv, bank, gram_t,
            num_coefs=128, amp_bits=16, tolerance_snr=None,
            singleton_weight=1.0, n_raw=None, num_select=ns,
        )

    jaxpr = jax.make_jaxpr(run)(scores0, e0, sc, sc, bank, gram_t)
    _assert_tiling_ok(jaxpr.jaxpr, f"encoder k={k} ns={ns}")
