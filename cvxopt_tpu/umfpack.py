"""cvxopt.umfpack-compatible namespace (reference:
/root/reference/src/C/umfpack.c:582-586 module exports).

Sparse unsymmetric LU behind the reference API names: `symbolic`,
`numeric`, `solve` (with trans 'N'/'T'/'C'), one-shot `linsolve`.
Backed by cvxopt_tpu.ops.spsolve's LU path: RCM + scan-based pivoted
banded LU for bandable patterns (never densifying), block-sparse
tile-map LDU for band-hostile patterns, dense LU otherwise.
Solutions are returned rather than overwriting B in place.
"""

from cvxopt_tpu.ops.spsolve import (
    lu_symbolic as symbolic,
    lu_numeric as numeric,
    lu_solve as solve,
    lu_linsolve as linsolve,
)

__all__ = ["symbolic", "numeric", "solve", "linsolve"]
