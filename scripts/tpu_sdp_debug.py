"""mcsdp m=200 at the 1e-7/1e-6 contract on TPU: why does the
'adaptive' mixed mode exit singular (status 4)?  Compare factor modes
with progress printing."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, '/root/repo')

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.conelp import make_conelp

m = int(sys.argv[1]) if len(sys.argv) > 1 else 200
mode = sys.argv[2] if len(sys.argv) > 2 else 'adaptive'

rng = np.random.default_rng(7)
w = rng.standard_normal((m, m))
w = (w + w.T) / np.sqrt(m)
G = np.zeros((m * m, m))
for j in range(m):
    G[j * m + j, j] = -1.0

dims = ConeDims(s=(m,))
core = make_conelp(dims, kktsolver='chol2', maxiters=40,
                   abstol=1e-7, reltol=1e-6, feastol=1e-7,
                   refinement=1, factor_dtype=mode,
                   show_progress=True)
c = jnp.ones((m,), jnp.float64)
Gj = jnp.asarray(G)
hj = jnp.asarray(w.reshape(-1, order='F'))
A0 = jnp.zeros((0, m), jnp.float64)
b0 = jnp.zeros((0,), jnp.float64)

t0 = time.time()
out = core(c, Gj, hj, A0, b0)
st = int(out['status'])
print(f'mode={mode} m={m}: status {st} iters {int(out["iterations"])} '
      f'gap {float(out["gap"]):.2e} pres {float(out["pres"]):.2e} '
      f'dres {float(out["dres"]):.2e}  wall {time.time()-t0:.1f}s',
      flush=True)
