"""Cone-aware distributed reductions (parallel/collectives) on the
8-device virtual mesh: block-sharded cone vectors reduce to the same
values the single-device cone kernels compute."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from cvxopt_tpu import cones
from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.parallel import collectives as coll


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("shards",))


def test_sharded_cone_reductions_match():
    ndev = 8
    # per-shard: 4 'l' entries + 2 SOC(3) blocks + 1 PSD(2) block
    ldims = ConeDims(l=4, q=(3, 3), s=(2,))
    gdims = ConeDims(l=4 * ndev, q=(3,) * (2 * ndev),
                     s=(2,) * ndev)
    rng = np.random.default_rng(0)

    def interior(dims, rng):
        x = rng.standard_normal(dims.cdim) * 0.1
        e = np.asarray(cones.cone_identity(dims))
        t = float(cones.max_step(jnp.asarray(x), dims))
        x = x + (t + 1.0) * e
        # symmetrize s blocks
        return np.asarray(cones.symmetrize(jnp.asarray(x), dims))

    # global vector laid out as [all l | all q | all s], sharded so
    # each device gets its own [l slice | q blocks | s block]
    xs = [interior(ldims, rng) for _ in range(ndev)]
    ys = [interior(ldims, rng) for _ in range(ndev)]
    xg = np.concatenate(
        [np.concatenate([x[:4] for x in xs]),
         np.concatenate([x[4:10] for x in xs]),
         np.concatenate([x[10:] for x in xs])])
    yg = np.concatenate(
        [np.concatenate([y[:4] for y in ys]),
         np.concatenate([y[4:10] for y in ys]),
         np.concatenate([y[10:] for y in ys])])
    xl = jnp.asarray(np.stack(xs))          # (ndev, local_cdim)
    yl = jnp.asarray(np.stack(ys))

    mesh = _mesh()

    @jax.jit
    def reduced(xl, yl):
        def f(x, y):
            x, y = x[0], y[0]
            return (coll.psdot(x, y, ldims, "shards"),
                    coll.psnrm2(x, ldims, "shards"),
                    coll.pmax_step(-x, ldims, "shards"),
                    coll.pstep_length(-x, -y, ldims, "shards"))

        return shard_map(f, mesh=mesh,
                         in_specs=(P("shards"), P("shards")),
                         out_specs=(P(), P(), P(), P()))(xl, yl)

    with mesh:
        gap, nrm, ts, step = reduced(xl, yl)
    assert np.isclose(float(gap),
                      float(cones.sdot(jnp.asarray(xg),
                                       jnp.asarray(yg), gdims)))
    assert np.isclose(float(nrm),
                      float(cones.snrm2(jnp.asarray(xg), gdims)))
    assert np.isclose(float(ts),
                      float(cones.max_step(jnp.asarray(-xg), gdims)))
    tref = max(float(cones.max_step(jnp.asarray(-xg), gdims)),
               float(cones.max_step(jnp.asarray(-yg), gdims)), 0.0)
    sref = 1.0 if tref == 0 else min(1.0, 0.99 / tref)
    assert np.isclose(float(step), sref)
