"""cvxopt.glpk-compatible namespace: `lp` and `ilp`.

The reference module binds GLPK's C simplex and branch-and-cut
(/root/reference/src/C/glpk.c:85 `lp`, :467 `ilp`, exported :994).
Here both are native: `lp` is the jittable/vmappable dense revised
simplex (cvxopt_tpu.simplex), `ilp` the batched branch-and-bound with
lifted cover cuts (cvxopt_tpu.ilp).  `options` takes GLPK parameter
names, matching the reference's options plumbing
(tests/test_glpk.py:50-77 in the reference suite).

PERFORMANCE ROUTING (measured, docs/performance.md): the vmapped
simplex is a CAPABILITY component — exact-vertex solutions, warm
starts for branch-and-bound — not a throughput path on TPU (0.06x
scipy HiGHS; the per-pivot f64 QR is emulated).  For speed, route
boeing2-class single LPs and LP batches through `solvers.lp`/
`solvers.conelp` (the IPM cores: the r05 headline paths).
"""

from cvxopt_tpu.simplex import lp
from cvxopt_tpu.ilp import ilp

#: module-level options dict, mirroring cvxopt.glpk.options
options: dict = {}

__all__ = ["lp", "ilp", "options"]
