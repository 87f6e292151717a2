"""Multi-chip sharded kernels: MSM and batched pairing products.

Design (BASELINE.json north star; SURVEY.md section 2c): the point axis /
pairing-pair axis is reshaped to a leading device axis `(D, N/D)`, placed
with a `NamedSharding` over the mesh, and the per-device partial reduction
runs under `jax.vmap` over that axis. Because every op in the vmapped local
program carries the device axis, GSPMD partitions it 1:1 onto the mesh with
no communication; the only collective is the one XLA inserts for the final
O(D) merge (all-gather of one Jacobian point / one Fq12 value per device) --
the "annotate shardings, let XLA insert collectives" recipe.

This replaces an earlier `shard_map` formulation: the manual-collective
version compiled ~6x slower (XLA partitioning of the scan-heavy local
program) for identical semantics; with one-value-per-device partials there
is nothing a hand-written collective schedule could overlap anyway.

Group/GT "sums" cannot use `psum` (they are not coordinate-wise adds), so
the merge gathers the O(1) partials and runs the group law replicated,
which is negligible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..ops.curve import Curve
from ..ops import msm as msm_mod
from ..ops import pairing as pr


def _put(mesh: Mesh, arr, dev_axis: int, axis: str):
    """Place `arr` with its axis `dev_axis` sharded over mesh axis `axis`."""
    spec = [None] * arr.ndim
    spec[dev_axis] = axis
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def _split_leading(mesh: Mesh, arr, batch_axis: int, axis: str):
    """Reshape axis `batch_axis` from N to (D, N/D) and shard the D axis."""
    D = mesh.shape[axis]
    n = arr.shape[batch_axis]
    assert n % D == 0, f"batch axis {n} not divisible by {D} devices"
    shp = arr.shape[:batch_axis] + (D, n // D) + arr.shape[batch_axis + 1:]
    return _put(mesh, arr.reshape(shp), batch_axis, axis)


@partial(jax.jit, static_argnums=(0, 3))
def _msm_over_devices(curve: Curve, pts, scal, window: int):
    """pts coords (*struct, D, per), inf (D, per); scal (nl, D, per)."""
    ns = curve.ns

    def local(p, s):
        return msm_mod.msm(curve, p, s, window=window)

    parts = jax.vmap(local, in_axes=((ns, ns, 0), 1),
                     out_axes=(ns, ns, ns))(pts, scal)     # jac, batch (D,)
    return curve.sum_reduce(parts, axis=0)


def sharded_msm(mesh: Mesh, curve, points_aff, scalars_std,
                window: int = 4, lanes: int = None, axis: str = "chips"):
    """MSM with the point axis sharded over `axis`.

    points_aff: affine batch (N,); scalars uint32[nl, N]; N divisible by
    n_devices. Returns a replicated Jacobian point ().
    (`lanes` is accepted and ignored -- see ops/msm.py.)
    """
    from ..utils import metrics
    ns = curve.ns
    D = mesh.shape[axis]
    N = points_aff[2].shape[-1]
    metrics.count("sharded_msm_points", N)
    # the only collective: all-gather of one Jacobian partial per device
    jac_bytes = 3 * curve.F.n * (2 if ns == 2 else 1) * 4
    metrics.collective_bytes(D, jac_bytes, "msm_merge")
    pts = (_split_leading(mesh, points_aff[0], ns, axis),
           _split_leading(mesh, points_aff[1], ns, axis),
           _split_leading(mesh, points_aff[2], 0, axis))
    scal = _split_leading(mesh, scalars_std, 1, axis)
    return _msm_over_devices(curve, pts, scal, window)


@jax.jit
def _miller_over_devices(p, q):
    """p: G1 affine coords (nl, D, per); q: G2 affine (nl, 2, D, per)."""
    def local(pp, qq):
        return pr.multi_miller(pp, qq, axis=0)       # (nl, 12)

    fs = jax.vmap(local, in_axes=((1, 1, 0), (2, 2, 0)),
                  out_axes=2)(p, q)                  # (nl, 12, D)
    return pr.final_exp(pr._product_reduce(fs, axis=0))


def sharded_multi_pairing(mesh: Mesh, p_aff, q_aff, axis: str = "chips"):
    """prod_k e(P_k, Q_k) with the pair axis sharded; ONE final exp.

    p_aff: G1 affine (K,), q_aff: G2 affine (K,); K divisible by n_devices.
    Returns a replicated Fq12 (nl, 12).
    """
    from ..ops.fp import FQ
    from ..utils import metrics
    D = mesh.shape[axis]
    metrics.count("sharded_pairings", p_aff[2].shape[-1])
    # the only collective: all-gather of one Fq12 Miller partial per device
    metrics.collective_bytes(D, FQ.n * 12 * 4, "pairing_merge")
    p = (_split_leading(mesh, p_aff[0], 1, axis),
         _split_leading(mesh, p_aff[1], 1, axis),
         _split_leading(mesh, p_aff[2], 0, axis))
    q = (_split_leading(mesh, q_aff[0], 2, axis),
         _split_leading(mesh, q_aff[1], 2, axis),
         _split_leading(mesh, q_aff[2], 0, axis))
    return _miller_over_devices(p, q)
