"""Operator-form linear maps for the advanced solver API.

The reference lets G, A, P be Python functions
``G(x, y, alpha, beta, trans)`` computing ``y := alpha*G*x + beta*y``
(coneprog.py:286-402, level-2 customization).  The TPU-native contract
is a pure pair (mv, rmv):

    op.mv(x)  == G @ x        (R^n -> cone space)
    op.rmv(z) == G.T @ z      (cone space -> R^n)

Both must be JAX-traceable.  Construct with `LinearOperator(mv, rmv,
shape)` or wrap a dense matrix with `aslinearoperator`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class LinearOperator:
    mv: Callable       # x -> A @ x
    rmv: Callable      # y -> A.T @ y
    shape: Tuple[int, int]

    def __call__(self, x, trans: str = "N"):
        return self.mv(x) if trans == "N" else self.rmv(x)


def aslinearoperator(A) -> LinearOperator:
    if isinstance(A, LinearOperator):
        return A
    M = jnp.asarray(A)
    return LinearOperator(mv=lambda x: M @ x, rmv=lambda y: M.T @ y,
                          shape=M.shape)
