"""Fused Pallas byte->felt ingest (words -> pre-bit-reversed felt rows).

The XLA form of the ingest (utils/packing.device_unpack_blocks +
bitrev_rows_device) needs a (nb, 15) -> (15, nb) transpose and a 16-way
lane interleave, and XLA lowers both of these non-power-of-2 relayouts to
near-scalar copies on TPU: ~3.5 ms at 2^16 felts (the ENTIRE small-blob
commit budget) and ~4 ms at 2^22. This kernel does the whole extraction in
one HBM pass:

  * each grid step loads a (B, 15) block of raw uint32 words (one 15-word
    group per sublane row = 16 felts, lcm(30, 32) = 480 bits),
  * transposes it IN VMEM (Mosaic relayout at register bandwidth),
  * applies the 16 fixed shift/or extractions (SURVEY.md A.1 bit layout),
  * writes the felts as 16 whole rows in rev4-permuted order.

Output layout (64, 2^(log_size-4)): row c*16 + j holds felt indices
n = c*L + 16*b + k of coordinate poly c with j = rev4(k). Because the felt
index splits as (b high, k low) and bit-reversal maps rev(n_loc) =
rev4(k) * 2^(m-4) + rev_{m-4}(b), this row layout IS the bit-reversed
order up to a per-row bit-reversal over the remaining m-4 bits — which
utils/packing.bitrev_rows_device performs with cheap power-of-2 tiled
relayouts. No element-granular interleave ever exists in HBM.

Bit-exact with the XLA path (tests/test_commit_jax.py, interpret mode) and
with the golden blob root on the real TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK30 = (1 << 30) - 1
# rev4(j): bit-reversal of 4-bit indices; involution, so out row j holds
# extracted felt k = REV4[j].
REV4 = (0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)
BLOCK_GROUPS = 2048  # 15-word groups per grid step (~124 B VMEM each)


def _ingest_kernel(w_ref, out_ref):
    wt = w_ref[...].T  # (15, B): in-VMEM transpose
    rows = [wt[i : i + 1, :] for i in range(15)]
    outs = []
    for k in range(16):
        bit = 30 * k
        i, s = bit // 32, bit % 32
        if s <= 2:
            v = (rows[i] >> jnp.uint32(s)) & jnp.uint32(_MASK30)
        else:
            v = (
                (rows[i] >> jnp.uint32(s))
                | (rows[i + 1] << jnp.uint32(32 - s))
            ) & jnp.uint32(_MASK30)
        outs.append(v)
    for j in range(16):
        out_ref[j, :] = outs[REV4[j]][0, :]


def supported(log_size: int) -> bool:
    """Shapes the kernel handles: at least one whole block row per poly."""
    return log_size >= 9  # q = 2^(log_size - 4) >= 32 groups per poly


def ingest_rows(words, log_size: int, interpret: bool = False):
    """Flat uint32 words (utils/packing.pad_to_words) -> (64, 2^(log_size-4))
    rev4-permuted felt rows (layout in module docstring)."""
    total = 1 << (log_size + 2)
    nb = total // 16
    q = nb // 4  # groups per coordinate poly
    b = min(BLOCK_GROUPS, q)
    words2d = words[: nb * 15].reshape(nb, 15)
    return pl.pallas_call(
        _ingest_kernel,
        out_shape=jax.ShapeDtypeStruct((64, q), jnp.uint32),
        grid=(4, q // b),
        in_specs=[
            pl.BlockSpec((b, 15), lambda c, g, _n=q // b: (c * _n + g, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((16, b), lambda c, g: (c, g),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(words2d)
