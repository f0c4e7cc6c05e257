"""Brute-MXU vs uniform-grid kNN A/B on the current platform.

Context: build_knn routes P > 20k to grid_knn_points (the FRNN-equivalent
path — the reference switches to FRNN at this scale).  On TPU the tradeoff
is not obvious: brute force is one big MXU matmul + top_k (vectorizes),
while the grid path is gather-heavy (~8 ns/row on the gather unit,
CLAUDE.md).  The multi-scene 4x25k step regressed 4.01 -> 6.94 s/it when
the grid dispatch landed; this pins the per-call numbers so the dispatch
threshold is measured, not assumed.

    python scripts/bench_knn.py [--platform cpu] [--k 11]
"""
import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--k", type=int, default=11,
                    help="neighbors per query (build_knn uses knn_k-1 = 11)")
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[20000, 25000, 50000, 100000])
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax
    import jax.numpy as jnp

    from dss_tpu.geometry.knn import grid_knn_points, knn_points

    def fibonacci_sphere(n, radius):
        import numpy as np

        i = np.arange(n, dtype=np.float64)
        phi = np.arccos(1 - 2 * (i + 0.5) / n)
        theta = np.pi * (1 + 5**0.5) * i
        pts = np.stack(
            [np.sin(phi) * np.cos(theta),
             np.sin(phi) * np.sin(theta), np.cos(phi)], axis=-1)
        return (pts * radius).astype(np.float32)

    for p in args.sizes:
        base = jnp.asarray(fibonacci_sphere(p, 0.5), jnp.float32)
        # DISTINCT input per rep: identical repeat dispatches measured
        # impossibly fast on the relay (20k brute read 0.04 ms — result
        # caching somewhere below us), so each rep gets its own jittered
        # cloud, uploaded and blocked before the clock starts.  One EXTRA
        # cloud (index reps) is dedicated to warmup so the timed loop's
        # first rep is not a re-dispatch of an already-computed array.
        clouds = [
            jax.block_until_ready(
                base + 0.003 * jax.random.normal(jax.random.PRNGKey(i),
                                                 base.shape)
            )
            for i in range(args.reps + 1)
        ]
        mask = jnp.ones((p,), bool)
        grid_res = max(4, math.ceil((p / 96.0) ** 0.5))

        def run(fn):
            out = fn(clouds[args.reps])  # compile + warm on the spare cloud
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for i in range(args.reps):
                out = fn(clouds[i])
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / args.reps * 1e3, out

        t_brute, (db, ib) = run(
            lambda c: knn_points(c, c, mask, mask, k=args.k,
                                 exclude_self=True)
        )
        t_approx, (da, ia) = run(
            lambda c: knn_points(c, c, mask, mask, k=args.k,
                                 exclude_self=True, approx=True)
        )
        t_grid, (dg, ig) = run(
            lambda c: grid_knn_points(c, mask, k=args.k, exclude_self=True,
                                      grid_res=grid_res, bucket_size=64)
        )
        # exactness margins against brute on the SAME cloud (the timed
        # loops end on clouds[reps-1]).  Two metrics: `agree` = fraction of
        # rows whose FULL k-sets match (strict), `recall` = mean fraction
        # of true neighbors recovered per row (what the regularizer's
        # surface estimate actually depends on).
        last = clouds[args.reps - 1]
        de, ie = knn_points(last, last, mask, mask, k=args.k,
                            exclude_self=True)

        def agree_recall(i_test):
            match = jnp.sort(ie, axis=-1) == jnp.sort(i_test, axis=-1)
            agree = float(match.all(-1).mean())
            hits = (i_test[:, :, None] == ie[:, None, :]).any(-1)
            recall = float(hits.mean())
            return agree, recall

        agree_g, recall_g = agree_recall(ig)
        agree_a, recall_a = agree_recall(ia)
        print(
            f"P={p:7d} brute {t_brute:8.2f} ms   approx {t_approx:8.2f} ms "
            f"(agree {agree_a:.4f}, recall {recall_a:.4f})   "
            f"grid {t_grid:8.2f} ms "
            f"(res {grid_res}, agree {agree_g:.4f}, recall {recall_g:.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
