"""cvxopt_tpu.solvers — solver front door.

Equivalent of the reference's `cvxopt.solvers` module
(/root/reference/src/python/solvers.py:35-41): exports the core IPM
solvers and the shared `options` dict.

    options['show_progress']  bool (default: False here; the reference
                              defaults to True — a jit-compiled solver
                              prints via jax.debug.print when enabled)
    options['maxiters']       positive integer (default: 100)
    options['abstol']         scalar (default: 1e-7)
    options['reltol']         scalar (default: 1e-6)
    options['feastol']        scalar (default: 1e-7)
    options['refinement']     nonnegative integer (default: 0 when no
                              'q'/'s' cones, else 1)
    options['kktreg']         static KKT regularization (default: None)
"""

from cvxopt_tpu.conelp import conelp, make_conelp, \
    make_conelp_cascade, make_conelp_ws
from cvxopt_tpu.coneqp import coneqp, make_coneqp, make_coneqp_cascade
from cvxopt_tpu.frontends import lp, qp, socp, sdp
from cvxopt_tpu.cvxprog import cp, cpl, gp

options = {}

__all__ = ["conelp", "coneqp", "cp", "cpl", "gp",
           "lp", "qp", "socp", "sdp", "options",
           "make_conelp", "make_coneqp", "make_coneqp_cascade",
           "make_conelp_cascade", "make_conelp_ws"]
