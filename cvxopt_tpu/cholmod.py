"""cvxopt.cholmod-compatible namespace (reference:
/root/reference/src/C/cholmod.c:1080-1093 module exports).

Functional equivalents backed by the TPU-native sparse direct path
(cvxopt_tpu.ops.spsolve): RCM + scan/block-panel banded Cholesky for
bandable patterns, tile-map block-sparse Cholesky for band-hostile
ones, dense batched factorization otherwise.  Differences from the
reference: solutions are RETURNED (arrays are immutable under JAX)
rather than overwriting B in place, and factors are lightweight
dataclasses instead of opaque capsules.

`options` mirrors cholmod.options (supernodal/print/nmethods/
postorder/dbound, cholmod.c:84-140) — it is the SAME dict object as
cvxopt_tpu.ops.spsolve.options.
"""

from cvxopt_tpu.ops.spsolve import (
    symbolic, numeric, solve, linsolve, splinsolve, diag, getfactor,
    options,
)


def spsolve(F, B, sys: int = 0):
    """cholmod.spsolve (cholmod.c:583): solve with a sparse right-hand
    side.  B may be scipy.sparse/BCOO; the dense solution is returned
    (the TPU-native design keeps solves dense — scattered-sparse
    triangular solves have no efficient XLA lowering)."""
    return solve(F, B, sys=sys)


__all__ = ["symbolic", "numeric", "solve", "spsolve", "linsolve",
           "splinsolve", "diag", "getfactor", "options"]
