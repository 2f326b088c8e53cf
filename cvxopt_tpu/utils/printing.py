"""Matrix formatting — cvxopt.printing equivalent
(reference: src/python/printing.py:20-191).

`options` controls the formats; `matrix_str_default` / `matrix_repr`
format dense arrays the way the reference formats its matrix type
(fixed-width scientific entries, column-major visual layout),
`spmatrix_str_triplet` formats sparse (BCOO/scipy) matrices in triplet
form.
"""

from __future__ import annotations

import numpy as np

options = {"dformat": "% .2e", "iformat": "% i", "width": 7,
           "height": -1}


def matrix_str_default(X) -> str:
    X = np.atleast_2d(np.asarray(X))
    m, n = X.shape
    width = options["width"] if options["width"] >= 0 else n
    height = options["height"] if options["height"] >= 0 else m
    fmt = (options["iformat"] if np.issubdtype(X.dtype, np.integer)
           else options["dformat"])
    rows = []
    for i in range(min(m, height)):
        entries = [fmt % X[i, j] for j in range(min(n, width))]
        if n > width:
            entries.append("...")
        rows.append("[" + " ".join(entries) + "]")
    if m > height:
        rows.append("[...]")
    return "\n".join(rows) + "\n"


def matrix_repr(X) -> str:
    X = np.atleast_2d(np.asarray(X))
    tc = "i" if np.issubdtype(X.dtype, np.integer) else (
        "z" if np.issubdtype(X.dtype, np.complexfloating) else "d")
    return f"<{X.shape[0]}x{X.shape[1]} matrix, tc='{tc}'>"


def spmatrix_str_triplet(X) -> str:
    import scipy.sparse as sp
    if hasattr(X, "todense") and not sp.issparse(X):   # BCOO
        idx = np.asarray(X.indices)
        data = np.asarray(X.data)
        rows, cols = idx[:, 0], idx[:, 1]
    else:
        C = sp.coo_matrix(X)
        rows, cols, data = C.row, C.col, C.data
    fmt = options["dformat"]
    lines = [f"({i},{j}) {fmt % v}" for i, j, v in
             zip(rows, cols, data)]
    return "\n".join(lines) + "\n"


def spmatrix_repr(X) -> str:
    import scipy.sparse as sp
    if sp.issparse(X):
        nnz = X.nnz
        shape = X.shape
    else:
        nnz = int(np.asarray(X.data).size)
        shape = X.shape
    return f"<{shape[0]}x{shape[1]} sparse matrix, nnz={nnz}>"
