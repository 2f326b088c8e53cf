"""cvxopt.glpk-compatible namespace: `lp` and `ilp`.

The reference module binds GLPK's C simplex and branch-and-cut
(/root/reference/src/C/glpk.c:85 `lp`, :467 `ilp`, exported :994).
Here both are native: `lp` is the jittable/vmappable dense revised
simplex (cvxopt_tpu.simplex), `ilp` the batched branch-and-bound with
lifted cover cuts (cvxopt_tpu.ilp).  `options` takes GLPK parameter
names, matching the reference's options plumbing
(tests/test_glpk.py:50-77 in the reference suite).
"""

from cvxopt_tpu.simplex import lp
from cvxopt_tpu.ilp import ilp

#: module-level options dict, mirroring cvxopt.glpk.options
options: dict = {}

__all__ = ["lp", "ilp", "options"]
