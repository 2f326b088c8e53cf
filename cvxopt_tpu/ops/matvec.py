"""Dense matrix-vector products with an f64-on-TPU fast path.

XLA emulates float64 on TPU; its emulated `dot_general` is pathologically
slow for (batched) matvecs — measured 146.8 ms for a (2048, 400, 64) f64
batched matvec pair where the SAME contraction written as an elementwise
multiply + reduce runs in 27.3 ms at identical 1e-15 accuracy
(scripts/tpu_f64_matvec.py).  The emulation expands each f64 scalar
product into a multi-term f32 series; XLA fuses elementwise-mul+reduce
into one vectorized pass but lowers the emulated dot to a far worse
schedule.

`mv`/`mvt` dispatch f64 vector products on accelerator backends to the
mulsum form; everything else (f32, CPU, matrix RHS) stays on `@` (MXU /
native BLAS).  Both forms vmap to the batched equivalent.

These back the IPM solvers' residual passes and KKT solve applications
(reference hot spots: coneprog.py:2169-2204 residuals, misc.py KKT
solves), which run in f64 on TPU under the mixed-precision design.
"""

import jax
import jax.numpy as jnp

__all__ = ["mv", "mvt", "vdot"]


def _use_mulsum(A, x):
    return (A.dtype == jnp.float64 and x.ndim == A.ndim - 1
            and jax.default_backend() != "cpu")


def mv(A, x):
    """A @ x for A (..., m, n), x (..., n) -> (..., m)."""
    if _use_mulsum(A, x):
        return jnp.sum(A * x[..., None, :], axis=-1)
    return A @ x


def mvt(A, z):
    """A.T @ z (adjoint product) for A (..., m, n), z (..., m) ->
    (..., n)."""
    if _use_mulsum(A, z):
        return jnp.sum(A * z[..., :, None], axis=-2)
    return jnp.swapaxes(A, -1, -2) @ z


def vdot(a, b):
    """Vector dot product along the last axis; written as mul+reduce so
    the f64 TPU lowering avoids the emulated dot_general (same pathology
    as `mv` — see module docstring)."""
    return jnp.sum(a * b, axis=-1)
