"""Stage-level timing of the analytic attention backward at training shapes.

Separately times: patch extraction + score recompute (matmul), fuse+softmax,
paste adjoints (two big einsums + fold), score-backward einsums, patch
adjoints. Identifies which stage holds the ~40 ms at batch 64.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from healthivert_tpu.ops.attention_pallas import (
    _fuse_ops,
    _patches_l,
    _patches_l_adjoint,
)
from healthivert_tpu.ops.contextual_attention import extract_patches, _fold_overlap_add


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, iters=10, reps=2):
    fetch(fn())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    hd = wd = 32
    c = 64
    num_l = hd * wd
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    fd = jnp.asarray(rng.standard_normal((bs, hd, wd, c)).astype(np.float32)).astype(jnp.bfloat16)
    bfull = jnp.asarray(
        rng.standard_normal((bs, 2 * hd, 2 * wd, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    dy = bfull
    mm = jnp.ones((bs, num_l), f32)
    sarr = jnp.asarray(rng.standard_normal((bs, num_l, num_l)).astype(np.float32))

    @jax.jit
    def stage_patches(fd):
        return _patches_l(fd, 3)

    t = timeit(lambda: stage_patches(fd))
    print(f"patches_l k3 x1:        {t:6.2f} ms", flush=True)

    fpat = stage_patches(fd)

    @jax.jit
    def stage_score(fpat):
        return jnp.einsum("bpk,blk->blp", fpat, fpat, preferred_element_type=f32)

    t = timeit(lambda: stage_score(fpat))
    print(f"score einsum:           {t:6.2f} ms", flush=True)

    fuse_fwd, fuse_adj = _fuse_ops(wd)

    @jax.jit
    def stage_fuse_softmax(s):
        fused = fuse_fwd(s)
        return jax.nn.softmax(fused * 10.0, axis=1)

    t = timeit(lambda: stage_fuse_softmax(sarr))
    print(f"fuse_fwd + softmax:     {t:6.2f} ms", flush=True)

    @jax.jit
    def stage_fuse_adj(s):
        return fuse_adj(s)

    t = timeit(lambda: stage_fuse_adj(sarr))
    print(f"fuse_adj:               {t:6.2f} ms", flush=True)

    @jax.jit
    def stage_paste_adj(bfull, dy, probs):
        raw = extract_patches(bfull, 4, 2).reshape(bs, num_l, -1)
        dv = (extract_patches(dy, 4, 2).reshape(bs, num_l, -1) / 4.0).astype(jnp.bfloat16)
        dprobs = jnp.einsum("blr,bpr->blp", raw, dv, preferred_element_type=f32)
        draw = jnp.einsum("blp,bpr->blr", probs.astype(jnp.bfloat16), dv,
                          preferred_element_type=f32)
        db = _fold_overlap_add(draw.reshape(bs, hd, wd, 4, 4, c), 2 * hd, 2 * wd, 2, 4)
        return dprobs, db

    t = timeit(lambda: stage_paste_adj(bfull, dy, sarr))
    print(f"paste adjoints (2 big einsums + fold + 2 extracts): {t:6.2f} ms", flush=True)

    @jax.jit
    def stage_score_bwd(ds0, fpat):
        ds0 = ds0.astype(jnp.bfloat16)
        dfpat = jnp.einsum("blp,blk->bpk", ds0, fpat, preferred_element_type=f32)
        dwpat = jnp.einsum("blp,bpk->blk", ds0, fpat, preferred_element_type=f32)
        return dfpat, dwpat

    t = timeit(lambda: stage_score_bwd(sarr, fpat))
    print(f"score bwd einsums:      {t:6.2f} ms", flush=True)

    @jax.jit
    def stage_patch_adj(dfpat):
        return _patches_l_adjoint(dfpat, hd, wd, c, 3)

    dfpat = jnp.asarray(
        rng.standard_normal((bs, num_l, 9 * c)).astype(np.float32)
    )
    t = timeit(lambda: stage_patch_adj(dfpat))
    print(f"patches_l_adjoint:      {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
