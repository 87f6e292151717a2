"""Pippenger multi-scalar multiplication, TPU-style.

The reference has no MSM at all -- its commitment/prover matrix products do
naive per-entry scalar-mul + sum under rayon (data_structures.rs:658-742,
see SURVEY.md section 2b). This module supplies the real thing, designed
for SIMD/vector hardware rather than task parallelism:

  * scalars are sliced into w-bit windows (digits);
  * lane-parallel bucket accumulation: points are split across C lanes;
    each lane keeps its own 2^w bucket accumulators PER WINDOW, and a
    `lax.scan` walks the N/C point rows, doing ONE batched
    gather -> curve-add -> scatter per row across (windows, lanes) -- so
    every step is a full-width vector operation;
  * lanes are then tree-merged, buckets weighted-reduced with the running-
    sum trick (scan over 2^w), and windows combined with w doublings each;
  * total group-op work: N + C*2^w + 2^w + 64*w adds, fully batched.

The sharded (multi-chip) version in parallel/sharded.py shards the point
axis over the mesh and merges per-device window sums with collectives.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .fp import FR
from .curve import Curve

NBITS = 256          # scalar width covered by windows (Fr < 2^255)


def _digits(scalars_std, window: int):
    """uint32[17, N] -> uint32[n_windows, N] w-bit digits, LSB window first."""
    n_windows = -(-NBITS // window)
    outs = []
    for k in range(n_windows):
        lo_bit = k * window
        limb_i = lo_bit // 16
        off = lo_bit % 16
        d = scalars_std[limb_i] >> off
        have = 16 - off
        if have < window and limb_i + 1 < scalars_std.shape[0]:
            d = d | (scalars_std[limb_i + 1] << have)
        outs.append(d & ((1 << window) - 1))
    return jnp.stack(outs)


def msm(curve: Curve, points_aff, scalars_std, window: int = 4,
        lanes: int = 16):
    """sum_i scalars[i] * points[i] over batch axis 0. Returns Jacobian ().

    points_aff: affine batch (N,); scalars_std: uint32[17, N] canonical.
    N must be a multiple of `lanes` (pad with infinity points upstream).
    """
    N = points_aff[2].shape[-1]
    assert N % lanes == 0, "pad the MSM to a lane multiple"
    rows = N // lanes
    n_windows = -(-NBITS // window)
    nbuck = 1 << window

    digs = _digits(scalars_std, window)              # (W, N)
    digs = digs.reshape(n_windows, rows, lanes)      # (W, rows, lanes)

    # reshape points to (rows, lanes)
    ns = curve.ns
    pts = (points_aff[0].reshape(points_aff[0].shape[:ns] + (rows, lanes)),
           points_aff[1].reshape(points_aff[1].shape[:ns] + (rows, lanes)),
           points_aff[2].reshape(rows, lanes))

    # bucket state: (W, lanes, nbuck) Jacobian points.
    # bucket 0 is a dump (digit 0 contributes nothing).
    buckets = curve.inf_jac((n_windows, lanes, nbuck))

    def row_step(buckets, inputs):
        dig_row, px, py, pinf = inputs                # dig (W, lanes); p (lanes)
        # broadcast the row's points over the window axis
        pt_row = (jnp.broadcast_to(px[..., None, :],
                                   px.shape[:-1] + (n_windows, px.shape[-1])),
                  jnp.broadcast_to(py[..., None, :],
                                   py.shape[:-1] + (n_windows, py.shape[-1])),
                  jnp.broadcast_to(pinf[None, :], (n_windows, pinf.shape[-1])))
        # gather current bucket values at (window, lane, digit)
        idx = dig_row                                  # (W, lanes)
        cur = _bucket_gather(curve, buckets, idx)
        # treat digit 0 as "skip": add infinity instead of the point
        skip = (idx == 0) | pt_row[2]
        pt_masked = (pt_row[0], pt_row[1], pt_row[2] | (idx == 0))
        new = curve.add_mixed(cur, pt_masked)
        buckets = _bucket_scatter(curve, buckets, idx, new)
        return buckets, None

    xs = (jnp.moveaxis(digs, 1, 0),                   # (rows, W, lanes)
          jnp.moveaxis(pts[0], ns, 0),                # (rows, ...struct, lanes)
          jnp.moveaxis(pts[1], ns, 0),
          pts[2])                                     # (rows, lanes)
    buckets, _ = lax.scan(row_step, buckets, xs)

    # ---- merge lanes: (W, lanes, nbuck) -> (W, nbuck) ----------------------
    merged = curve.sum_reduce(buckets, axis=1)

    # ---- weighted bucket reduction: sum_b b * S_b via running suffix sums --
    # iterate b from high to low: running += S_b ; acc += running
    def bucket_step(state, b_rev):
        running, acc = state
        sb = jax.tree_util.tree_map(
            lambda l: jnp.take(l, b_rev, axis=curve.ns + 1), merged)
        running = curve.add(running, sb)
        acc = curve.add(acc, running)
        return (running, acc), None

    b_indices = jnp.arange(nbuck - 1, 0, -1)
    init = (curve.inf_jac((n_windows,)), curve.inf_jac((n_windows,)))
    (_, wsums), _ = lax.scan(bucket_step, init, b_indices)   # (W,) points

    # ---- combine windows: acc = sum_k 2^(w k) wsums[k], high to low --------
    def win_step(acc, k_rev):
        for _ in range(window):
            acc = curve.double(acc)
        wk = jax.tree_util.tree_map(
            lambda l: jnp.take(l, k_rev, axis=curve.ns), wsums)
        return curve.add(acc, wk), None

    acc, _ = lax.scan(win_step, curve.inf_jac(()),
                      jnp.arange(n_windows - 1, -1, -1))
    return acc


def _bucket_gather(curve, buckets, idx):
    """Jacobian buckets (leaves (*struct, W, lanes, nbuck)) at idx (W, lanes)."""
    def g(l):
        ii = idx.reshape((1,) * (l.ndim - 3) + idx.shape + (1,))
        ii = jnp.broadcast_to(ii, l.shape[:-1] + (1,)).astype(jnp.int32)
        return jnp.take_along_axis(l, ii, axis=-1).squeeze(-1)

    return tuple(g(l) for l in buckets)


def _bucket_scatter(curve, buckets, idx, new):
    """Write `new` (jacobian, (W, lanes) batch) into buckets at idx."""
    def s(l, v):
        ii = idx.reshape((1,) * (l.ndim - 3) + idx.shape + (1,))
        ii = jnp.broadcast_to(ii, l.shape[:-1] + (1,)).astype(jnp.int32)
        return jnp.put_along_axis(l, ii, v[..., None], axis=-1,
                                  inplace=False)

    return tuple(s(l, v) for l, v in zip(buckets, new))


def msm_curve(curve: Curve, points_aff, scalars_std, window: int = 4,
              lanes: int = 16):
    """Alias with explicit name for the parallel layer."""
    return msm(curve, points_aff, scalars_std, window=window, lanes=lanes)
