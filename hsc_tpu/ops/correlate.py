"""Device-side correlation: the MP init step as an MXU convolution.

Reference: the dense `innerProducts` init of `hsc/modeling.py ::
ConvolutionalMatchingPursuit.computeCoefficients` (SURVEY.md §3.3) — a
NumPy/SciPy correlate there; here one `lax.conv_general_dilated` that XLA
tiles onto the MXU (im2col matmul), float32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def correlate_bank_jax(x: jax.Array, bank: jax.Array) -> jax.Array:
    """Valid-mode correlation scores ``[K, Npos]`` (spec layout: atoms on
    sublanes, positions on lanes) of ``x [N, C]`` against ``bank [K, W, C]``.

    XLA's conv is cross-correlation (no kernel flip), so this is exactly
    ``scores[k, t] = sum_{u,c} x[t+u, c] * bank[k, u, c]``.
    """
    lhs = x.astype(jnp.float32).T[None]  # [1, C, N]
    rhs = bank.astype(jnp.float32).transpose(0, 2, 1)  # [K, C, W]
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        # Full float32 on the MXU (3-pass bf16): scores feed the quantizer
        # directly (code = rint(s/scale)), so bf16 products would flip codes
        # vs the float32 oracle.  This is a spec requirement, not a tuning.
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]  # [K, Npos]
