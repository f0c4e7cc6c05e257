"""Point-cloud denoising CLI (the paper's armadillo benchmark pipeline).

Reference workflow: DSS/core/cloud.py geometry ops chained — outlier removal,
bilateral normal denoising, RIMLS projection to the latent surface, uniform
resampling (repulsion), optional upsampling (SURVEY.md §2.7; README
"denoising" application).

Usage:
  python -m dss_tpu.apps.denoise_pcl --input noisy.ply --out denoised.ply \
      [--iters 3] [--remove-outliers] [--upsample N] [--platform cpu]
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Denoise a point cloud")
    parser.add_argument("--input", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--iters", type=int, default=1, help="project+resample rounds")
    parser.add_argument("--remove-outliers", action="store_true")
    parser.add_argument("--outlier-tolerance", type=float, default=0.05)
    parser.add_argument("--neighborhood-size", type=int, default=16)
    parser.add_argument("--normal-k", type=int, default=32,
                        help="PCA neighborhood for normal estimation; must "
                             "out-scale the noise (k=16 patches are noise "
                             "balls at sigma ~ point spacing — measured "
                             "|cos| vs GT 0.95 @16 vs 0.97 @32 on the "
                             "sigma=0.3%% benchmark)")
    parser.add_argument("--sharpness-sigma", type=float, default=30.0)
    parser.add_argument("--repulsion-mu", type=float, default=0.0,
                        help="uniform-resampling strength; 0 disables "
                             "(resampling trades a little p2f for "
                             "uniformity - opt in)")
    parser.add_argument("--ignore-input-normals", action="store_true",
                        help="estimate normals even if the .ply has them")
    parser.add_argument("--upsample", type=int, default=0, help="target point count")
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args(argv)

    import jax

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax.numpy as jnp

    from dss_tpu.data.io import read_ply, save_ply
    from dss_tpu.geometry.denoise import (
        denoise_normals_bilateral,
        project_to_latent_surface,
        remove_outliers,
        resample_uniformly,
        upsample_ear,
    )
    from dss_tpu.geometry.normals import estimate_normals

    ply = read_ply(args.input)
    pts = jnp.asarray(ply.points)
    p = pts.shape[0]
    mask = jnp.ones((p,), bool)
    print("loaded %d points from %s" % (p, args.input))

    if args.remove_outliers:
        mask = remove_outliers(pts, mask, args.neighborhood_size, args.outlier_tolerance)
        print("outlier removal: %d points kept" % int(mask.sum()))

    if ply.normals is not None and not args.ignore_input_normals:
        normals = jnp.asarray(ply.normals)
    else:
        normals = estimate_normals(
            pts, mask, neighborhood_size=min(args.normal_k, p - 1)
        )

    for i in range(args.iters):
        normals = denoise_normals_bilateral(
            pts, normals, mask, args.sharpness_sigma, args.neighborhood_size
        )
        # Tuned on the σ=0.3%-bbox-diag benchmark (a72-seated_jew, 20k pts):
        # k15 / one projection step / 5 robust-reweight iterations gives
        # chamfer −25% AND point-to-surface −37%; more rounds or larger
        # projection neighborhoods over-smooth (BENCHMARKS.md §denoising).
        pts = project_to_latent_surface(
            pts, normals, mask, neighborhood_size=min(15, p - 1),
            max_proj_iters=1, max_est_iter=5,
        )
        if args.repulsion_mu > 0:
            pts = resample_uniformly(
                pts, mask, normals=normals, neighborhood_size=8,
                iters=1, repulsion_mu=args.repulsion_mu,
            )
        if args.iters > 1 and i + 1 < args.iters:
            normals = estimate_normals(
                pts, mask, neighborhood_size=min(args.normal_k, p - 1),
                reference_normals=normals,
            )
        print("round %d/%d done" % (i + 1, args.iters))

    normals = estimate_normals(pts, mask, neighborhood_size=8, reference_normals=normals)

    if args.upsample > int(mask.sum()):
        n_cur = int(mask.sum())
        cap = args.upsample
        pts_c = jnp.zeros((cap, 3)).at[:n_cur].set(pts[mask])
        nrm_c = jnp.zeros((cap, 3)).at[:n_cur].set(normals[mask])
        m_c = jnp.arange(cap) < n_cur
        pts_c, m_c = upsample_ear(pts_c, nrm_c, m_c, n_cur, cap)
        pts, mask = pts_c, m_c
        normals = estimate_normals(pts, mask, neighborhood_size=8)
        print("upsampled to %d points" % int(mask.sum()))

    keep = np.asarray(mask)
    save_ply(args.out, np.asarray(pts)[keep], normals=np.asarray(normals)[keep])
    print("wrote", args.out)


if __name__ == "__main__":
    main()
