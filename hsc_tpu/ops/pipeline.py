"""Batch pipelining for the three-stage encode (init -> host steps -> loop).

The host quantizer steps (`ops.encode.quantizer_steps`) cost one device->host
round trip per batch for the tiny peak vector.  On a local TPU host that is
microseconds; over a remote relay it can dominate.  This helper overlaps the
round trips across batches: all init stages are dispatched first with async
host copies of their peaks, then the loop stages are dispatched as each peak
vector lands — the device stays busy while peaks are in flight.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .encode import encode_init_batched, quantizer_steps


def encode_batches_pipelined(
    batches: list[jax.Array],
    bank: jax.Array,
    gram_t: jax.Array,
    *,
    backend: str = "pallas",
    **settings,
):
    """Encode a list of ``[B, N, C]`` batches; returns a list of EncodedBlock.

    `settings` are the static encode settings (num_coefs, amp_bits, ...).
    """
    defaults = dict(
        amp_bits=16, tolerance_snr=None, singleton_weight=1.0, n_raw=None,
        num_select=1,
    )
    settings = {**defaults, **settings}
    if backend == "pallas" and batches:
        # the fused kernel's multi-select sweep needs num_select in {1, fold}
        # for this geometry; other S run the XLA multi-select path
        from .mp_kernels import pallas_fold

        npos = int(batches[0].shape[1]) - int(bank.shape[1]) + 1
        if settings["num_select"] not in (1, pallas_fold(npos, int(bank.shape[1]))):
            backend = "jax"
    if backend == "pallas":
        from .mp_kernels import _mp_pallas_stage

        def loop(s0, e0, sc, iv):
            return _mp_pallas_stage(
                s0, e0, sc, iv, bank, gram_t, interpret=False, **settings
            )
    else:
        from .encode import batched_loop_for

        vloop = batched_loop_for(tuple(sorted(settings.items())))

        def loop(s0, e0, sc, iv):
            return vloop(s0, e0, sc, iv, bank, gram_t)

    # stage 1: dispatch every init; start async copies of the peaks
    inits = []
    for xb in batches:
        s0, e0, peak = encode_init_batched(xb, bank)
        try:
            peak.copy_to_host_async()
        except AttributeError:
            pass
        inits.append((s0, e0, peak))
    # stage 2: as peaks land, compute host steps and dispatch the loops
    outs = []
    amp_bits = settings.get("amp_bits", 16)
    for s0, e0, peak in inits:
        scale, inv = quantizer_steps(np.asarray(jax.device_get(peak)), amp_bits)
        outs.append(loop(s0, e0, jnp.asarray(scale), jnp.asarray(inv)))
    return outs
