"""Numeric kernel layer — TPU-native equivalents of the reference's
C extension modules (SURVEY.md §2.2-2.3):

  blas     cvxopt.blas   (src/C/blas.c:3840-3873)  — 34 functions
  lapack   cvxopt.lapack (src/C/lapack.c:7341-7400) — factorizations
  spsolve  cvxopt.cholmod/umfpack/amd (src/C/{cholmod,umfpack,amd}.c)

All functions are pure (return results instead of mutating), batched
over leading axes, and jit/vmap-compatible.  The reference's
offset/ld/inc strided-view kwargs are replaced by array slicing —
callers slice, then call.
"""

from cvxopt_tpu.ops import blas, lapack, spsolve

__all__ = ["blas", "lapack", "spsolve"]
