"""Multi-chip sharded kernels: MSM and batched pairing products.

Design (BASELINE.json north star; SURVEY.md section 2c): points / pairing
pairs shard over a 1-D mesh axis; each chip reduces its shard locally
(Pippenger buckets, Miller-loop products); the tiny per-chip partials
(one Jacobian point, one Fq12 value) are combined with `all_gather` and a
replicated tree reduction -- group/GT "sums" cannot use `psum` (they are
not coordinate-wise adds), so the collective moves the O(1) partials and
the group law runs replicated, which is negligible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


from ..ops.fp import FR
from ..ops.curve import G1, G2
from ..ops import msm as msm_mod
from ..ops import pairing as pr
from ..ops.tower import FQ12


def sharded_msm(mesh: Mesh, curve, points_aff, scalars_std,
                window: int = 4, lanes: int = 16, axis: str = "chips"):
    """MSM with the point axis sharded over `axis`.

    points_aff: affine batch (N,); scalars uint32[17, N]; N divisible by
    (n_devices * lanes). Returns a replicated Jacobian point ().
    """
    ns = curve.ns
    coord_spec = P(*([None] * ns + [axis]))
    in_specs = ((coord_spec, coord_spec, P(axis)), P(None, axis))
    out_specs = (P(None), P(None), P(None))  # replicated jacobian coords

    def local(pts, scal):
        part = msm_mod.msm(curve, pts, scal, window=window, lanes=lanes)
        # gather every chip's partial and reduce replicated
        gx = lax.all_gather(part[0], axis)      # (D, *coord)
        gy = lax.all_gather(part[1], axis)
        gz = lax.all_gather(part[2], axis)
        stacked = (jnp.moveaxis(gx, 0, ns), jnp.moveaxis(gy, 0, ns),
                   jnp.moveaxis(gz, 0, ns))
        return curve.sum_reduce(stacked, axis=0)

    f = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
    return f(points_aff, scalars_std)


def sharded_multi_pairing(mesh: Mesh, p_aff, q_aff, axis: str = "chips"):
    """prod_k e(P_k, Q_k) with the pair axis sharded; ONE final exp.

    p_aff: G1 affine (K,), q_aff: G2 affine (K,); K divisible by n_devices.
    Returns a replicated Fq12 (nl, 12).
    """
    g1_spec = P(None, axis)
    g2_spec = P(None, None, axis)
    in_specs = ((g1_spec, g1_spec, P(axis)), (g2_spec, g2_spec, P(axis)))
    out_specs = P(None, None)

    def local(p, q):
        f = pr.multi_miller(p, q, axis=0)       # local product (nl, 12)
        g = lax.all_gather(f, axis)             # (D, nl, 12)
        g = jnp.moveaxis(g, 0, 2)               # (nl, 12, D)
        return pr._product_reduce(g, axis=0)

    f = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
    return pr.final_exp(f(p_aff, q_aff))
