"""cvxopt.amd-compatible namespace (reference:
/root/reference/src/C/amd.c:226 — single function `order`).

`order(A)` returns a fill-reducing (approximate-minimum-degree-style)
ordering of the symmetrized sparsity pattern, computed host-side by
the native C implementation (cvxopt_tpu/native/mindeg.c) with a
pure-Python fallback."""

from cvxopt_tpu.ops.spsolve import amd_order as order

__all__ = ["order"]
