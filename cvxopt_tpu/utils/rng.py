"""Random matrices — cvxopt.gsl equivalents and the package-level
normal/uniform/setseed/getseed API (reference: src/C/gsl.c:168-171 and
the Python fallback src/python/__init__.py:86-158), on jax.random.

A module-level PRNG key mirrors the reference's stateful generator;
`setseed()`/`getseed()` manage it.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

_state = {"seed": 0, "count": 0}


def setseed(value: int = None):
    """Set the RNG seed (reference setseed; value=None re-seeds from
    the clock, matching gsl.setseed(0) semantics)."""
    if value is None:
        value = int(time.time_ns() % (2 ** 31))
    _state["seed"] = int(value)
    _state["count"] = 0


def getseed() -> int:
    return _state["seed"]


def _next_key():
    k = jax.random.fold_in(jax.random.PRNGKey(_state["seed"]),
                           _state["count"])
    _state["count"] += 1
    return k


def normal(nrows: int, ncols: int = 1, mean: float = 0.0,
           std: float = 1.0):
    """Matrix of N(mean, std^2) samples (reference cvxopt.normal)."""
    x = jax.random.normal(_next_key(), (nrows, ncols))
    x = mean + std * x
    return x[:, 0] if ncols == 1 else x


def uniform(nrows: int, ncols: int = 1, a: float = 0.0, b: float = 1.0):
    """Matrix of U[a, b) samples (reference cvxopt.uniform)."""
    x = jax.random.uniform(_next_key(), (nrows, ncols), minval=a,
                           maxval=b)
    return x[:, 0] if ncols == 1 else x
