"""cvxopt_tpu — a TPU-native convex optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CVXOPT
(reference: /root/reference, cvxopt/cvxopt): primal-dual interior-point
solvers for LP/QP/SOCP/SDP and smooth nonlinear convex programs over the
symmetric cone R^l_+ x SOC(q_0..q_N) x PSD(s_0..s_M), plus a modeling
layer and numeric utility modules.

Design (see SURVEY.md section 7):
  - arrays, not matrix objects: problems are jnp arrays + a static
    `ConeDims` describing the cone structure;
  - every solver is a pure function compiled once with `jax.jit` and
    batchable with `jax.vmap`;
  - iteration control flow is `lax.while_loop` with carried state, so a
    whole solve is a single XLA computation;
  - cone blocks of equal size are processed as stacked batches ("runs")
    so 100 SOC blocks cost one vectorized op, not 100 kernels.

Capability parity map (reference file:line cited in each module).
"""

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu import cones
from cvxopt_tpu import scaling
from cvxopt_tpu import kkt
from cvxopt_tpu import kkt_structured
from cvxopt_tpu import solvers
from cvxopt_tpu import modeling
from cvxopt_tpu import mpsio
from cvxopt_tpu import base
from cvxopt_tpu.linops import LinearOperator, aslinearoperator

# reference top-level API (src/python/__init__.py:86-291)
from cvxopt_tpu.base import (
    matrix, spmatrix, sparse, spdiag, exp, log, sqrt, sin, cos, mul,
    div, emin, emax, trans, ctrans, real, imag,
)
from cvxopt_tpu.utils.rng import normal, uniform, setseed, getseed
from cvxopt_tpu.utils import printing

__version__ = "0.1.0"

__all__ = [
    "ConeDims", "cones", "scaling", "kkt", "solvers", "modeling",
    "mpsio", "base", "LinearOperator", "aslinearoperator",
    "matrix", "spmatrix", "sparse", "spdiag", "exp", "log", "sqrt",
    "sin", "cos", "mul", "div", "emin", "emax", "trans", "ctrans",
    "real", "imag",
    "normal", "uniform", "setseed", "getseed", "printing",
    "__version__",
]
