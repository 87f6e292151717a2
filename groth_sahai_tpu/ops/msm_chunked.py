"""Chunked MSM with per-chunk checkpointing and resume.

SURVEY.md section 5: "long MSM jobs get chunk-level recomputation, not
elasticity". A huge MSM is split into fixed-size chunks; each chunk runs
the ops/msm.py kernel and its Jacobian partial is appended to a manifest
on disk (arkworks-canonical uncompressed bytes via the native bulk codec).
After a crash, completed chunks are loaded and only the remainder is
recomputed. The chunk combine is a tiny tree reduction.

This also bounds device memory: the sort/gather/prefix pipeline's
footprint is O(chunk * windows), independent of total N.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from .curve import Curve
from . import msm as msm_mod
from ..utils import metrics


def _partial_path(ckpt_dir: str, idx: int) -> str:
    return os.path.join(ckpt_dir, f"msm_partial_{idx:06d}.bin")


def _save_partial(curve: Curve, ckpt_dir: str, idx: int, jac) -> None:
    """Store one Jacobian partial as an uncompressed affine point."""
    from ..utils import serde
    aff = jax.jit(curve.to_affine, static_argnums=())(
        jax.tree_util.tree_map(lambda l: l[..., None], jac))
    if curve.ns == 1:
        data = serde.g1_vec_to_bytes_bulk(aff, compressed=False)
    else:
        data = serde.g2_vec_to_bytes_bulk(aff, compressed=False)
    tmp = _partial_path(ckpt_dir, idx) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, _partial_path(ckpt_dir, idx))     # atomic publish


def _load_partial(curve: Curve, ckpt_dir: str, idx: int):
    from ..utils import serde
    path = _partial_path(ckpt_dir, idx)
    if not os.path.exists(path):
        return None
    data = open(path, "rb").read()
    if curve.ns == 1:
        aff, _ = serde.g1_vec_from_bytes_bulk(data, validate=True)
    else:
        aff, _ = serde.g2_vec_from_bytes_bulk(data, validate=True)
    return curve.from_affine(
        jax.tree_util.tree_map(lambda l: l[..., 0], aff))


def msm_chunked(curve: Curve, points_aff, scalars_std, window: int = 0,
                chunk_size: int = 1 << 16, ckpt_dir: str | None = None):
    """sum_i s_i P_i over the trailing axis, in resumable chunks.

    With `ckpt_dir`, every finished chunk's partial is persisted (atomic
    rename) and already-present partials are NOT recomputed -- kill the
    process at any point and rerun to resume.
    """
    N = points_aff[2].shape[-1]
    if not window:
        window = 8 if chunk_size < 16384 else 13
    n_chunks = -(-N // chunk_size)
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)
        manifest = {"n_points": N, "chunk_size": chunk_size,
                    "window": window, "curve": curve.name}
        with open(os.path.join(ckpt_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    ns = curve.ns
    parts = []
    for c in range(n_chunks):
        if ckpt_dir:
            cached = _load_partial(curve, ckpt_dir, c)
            if cached is not None:
                parts.append(cached)
                metrics.count("msm_chunks_resumed")
                continue
        lo, hi = c * chunk_size, min((c + 1) * chunk_size, N)
        pts_c = (jax.lax.slice_in_dim(points_aff[0], lo, hi, axis=ns),
                 jax.lax.slice_in_dim(points_aff[1], lo, hi, axis=ns),
                 jax.lax.slice_in_dim(points_aff[2], lo, hi, axis=0))
        scal_c = jax.lax.slice_in_dim(scalars_std, lo, hi, axis=1)
        with metrics.span("msm_chunk"):
            part = jax.jit(msm_mod.msm_curve, static_argnums=(0, 3))(
                curve, pts_c, scal_c, window)
            jax.block_until_ready(part)
        metrics.count("msm_points", hi - lo)
        if ckpt_dir:
            _save_partial(curve, ckpt_dir, c, part)
        parts.append(part)

    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls, axis=ns), *parts)
    return curve.sum_reduce(stacked, axis=0)
