"""M31 / CM31 / QM31 arithmetic on JAX uint32 lanes (TPU-native).

TPU VPUs are 32-bit integer machines with no 64-bit multiply, so M31
multiplication decomposes the 32x32->64 product into 16-bit limbs and applies
branchless Mersenne reduction (2^31 === 1 mod P). All functions are shape-
polymorphic elementwise ops on uint32 arrays and are jit/pallas friendly.

QM31 values are represented as 4-tuples of uint32 arrays (a, b, c, d) meaning
(a + b i) + (c + d i) u with i^2 = -1, u^2 = 2 + i — the same flat coordinate
order as the reference's SecureEvaluation columns (SURVEY.md B.1;
/root/reference/src/proof.rs:62-66).

Oracle counterpart: frieda_tpu/spec/field.py (tested equal on random vectors).
"""

from __future__ import annotations

import jax.numpy as jnp

# NB: module constants stay Python ints (not jnp scalars) so these functions
# can be traced inside Pallas kernels, which reject captured device constants.
P_INT = (1 << 31) - 1
P = P_INT  # uint32 ops with Python-int operands keep their dtype


def _u32(x):
    return jnp.asarray(x, jnp.uint32)


def m31_add(a, b):
    s = a + b  # < 2P < 2^32
    return s - jnp.where(s >= P, jnp.uint32(P), jnp.uint32(0))


def m31_sub(a, b):
    s = a + (jnp.uint32(P) - b)  # in (0, 2P)
    return s - jnp.where(s >= P, jnp.uint32(P), jnp.uint32(0))


def m31_neg(a):
    return jnp.where(a == 0, jnp.uint32(0), jnp.uint32(P) - a)


def m31_mul(a, b):
    """Canonical product mod P via 16-bit limb split (no 64-bit ops)."""
    a0 = a & 0xFFFF
    a1 = a >> 16  # < 2^15 for canonical inputs
    b0 = b & 0xFFFF
    b1 = b >> 16
    p0 = a0 * b0          # < 2^32 (wraps are exact: full low product)
    mid = a0 * b1 + a1 * b0  # each term < 2^31, sum < 2^32
    p2 = a1 * b1          # < 2^30
    lo = p0 + (mid << 16)
    carry = (lo < p0).astype(jnp.uint32)
    hi = p2 + (mid >> 16) + carry      # == full product >> 32, <= 2^30 - 2
    # product = hi*2^32 + lo; 2^32 === 2 (mod P), 2^31 === 1
    s = (hi << 1) + (lo >> 31) + (lo & P)  # <= 2^32 - 4, no overflow
    s = (s & P) + (s >> 31)                # in [0, P]
    return s - jnp.where(s >= P, jnp.uint32(P), jnp.uint32(0))


def m31_mul_const(a, c: int):
    return m31_mul(a, jnp.uint32(c % P_INT))


def m31_pow(a, e: int):
    """a^e for a static Python exponent (square-and-multiply, unrolled)."""
    acc = None
    base = a
    while e:
        if e & 1:
            acc = base if acc is None else m31_mul(acc, base)
        e >>= 1
        if e:
            base = m31_mul(base, base)
    if acc is None:
        return jnp.ones_like(a)
    return acc


def m31_inv(a):
    """Batched inverse: a^(P-2). Zero maps to zero (caller beware)."""
    return m31_pow(a, P_INT - 2)


# ---------------------------------------------------------------------------
# CM31: pairs (re, im)
# ---------------------------------------------------------------------------

def cm31_add(x, y):
    return (m31_add(x[0], y[0]), m31_add(x[1], y[1]))


def cm31_sub(x, y):
    return (m31_sub(x[0], y[0]), m31_sub(x[1], y[1]))


def cm31_mul(x, y):
    return (
        m31_sub(m31_mul(x[0], y[0]), m31_mul(x[1], y[1])),
        m31_add(m31_mul(x[0], y[1]), m31_mul(x[1], y[0])),
    )


# ---------------------------------------------------------------------------
# QM31: 4-tuples (a, b, c, d); u^2 = 2 + i
# ---------------------------------------------------------------------------

def qm31_add(x, y):
    return tuple(m31_add(x[i], y[i]) for i in range(4))


def qm31_sub(x, y):
    return tuple(m31_sub(x[i], y[i]) for i in range(4))


def qm31_neg(x):
    return tuple(m31_neg(x[i]) for i in range(4))


def qm31_mul(x, y):
    a_, b_ = (x[0], x[1]), (x[2], x[3])
    c_, d_ = (y[0], y[1]), (y[2], y[3])
    ac = cm31_mul(a_, c_)
    bd = cm31_mul(b_, d_)
    # bd * (2 + i) = (2*bd0 - bd1, bd0 + 2*bd1)
    two = jnp.uint32(2)
    r = (
        m31_sub(m31_mul(bd[0], two), bd[1]),
        m31_add(bd[0], m31_mul(bd[1], two)),
    )
    lo = cm31_add(ac, r)
    hi = cm31_add(cm31_mul(a_, d_), cm31_mul(b_, c_))
    return (lo[0], lo[1], hi[0], hi[1])


def qm31_mul_m31(x, s):
    return tuple(m31_mul(x[i], s) for i in range(4))


def qm31_from_m31(a):
    z = jnp.zeros_like(a)
    return (a, z, z, z)


def qm31_stack(x):
    """4-tuple of (...,) arrays -> (..., 4) array (for storage/transport)."""
    return jnp.stack(x, axis=-1)


def qm31_unstack(arr):
    return tuple(arr[..., i] for i in range(4))
