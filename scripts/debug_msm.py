import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import random
import jax, jax.numpy as jnp, numpy as np

import tests.conftest  # noqa: F401  (cpu + cache config)
from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints, g1_affine_to_ints
from groth_sahai_tpu.ops import msm as msm_mod
from tests import oracle as O

rng = random.Random(31)
N = 8
ks = [rng.randrange(1, 200) for _ in range(N)]
ss = [rng.randrange(O.R) for _ in range(N)]
pts_o = [O.g1_mul(O.G1_GEN, k) for k in ks]
pts = g1_affine_from_ints([(p[0].v, p[1].v) for p in pts_o])
scal = jnp.asarray(ints_to_limbs(ss, FR.n))

out = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, window=4, width=4))(pts, scal)
got = g1_affine_to_ints(jax.jit(G1.to_affine)(
    jax.tree_util.tree_map(lambda l: l[..., None], out)))

want = None
for p, s in zip(pts_o, ss):
    want = O.g1_add(want, O.g1_mul(p, s))
print("match:", got == [(want[0].v, want[1].v)])

if got != [(want[0].v, want[1].v)]:
    # compare per-window sums against a host recomputation
    W = 64
    nbuck = 16
    digs = np.asarray(msm_mod._digits(scal, 4))
    for w in range(W):
        exp_w = None
        for i in range(N):
            d = int(digs[w, i])
            if d:
                q = O.g1_mul(pts_o[i], d)
                exp_w = O.g1_add(exp_w, q)
        # recompute device window sum via direct msm internals? just report
    # host full recompute to confirm the oracle expectation
    acc = None
    for w in range(W - 1, -1, -1):
        if acc is not None:
            for _ in range(4):
                acc = O.g1_add(acc, acc)
        sw = None
        for i in range(N):
            d = int(digs[w, i])
            if d:
                sw = O.g1_add(sw, O.g1_mul(pts_o[i], d))
        acc = O.g1_add(acc, sw) if acc is not None else sw
    print("host-window recompute matches oracle:",
          acc == want)
    print("got:", got)
    print("want:", (want[0].v, want[1].v))
