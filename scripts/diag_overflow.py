"""Diagnose WHICH binning budget a checkpoint's geometry overflows.

The train loop reports one summed `bin_overflow` scalar (span + per-tile
capacity + live-pair truncation, forward and backward tables pooled).  This
script loads a checkpoint + dataset, rebuilds both candidate tables for a
view batch exactly as the renderer does, and prints the three components
separately per table — so a nonzero overflow (e.g. E20's 27.8k at 10k
points, BENCHMARKS.md round 4) can be pinned to the budget that actually
dropped pairs before anyone "fixes" the wrong knob.

Usage:
  python scripts/diag_overflow.py --ckpt exp/dss_e20_10k_fine/model_best.npz \
      --config exp/dss_e20_10k_fine/config.yaml [--views 0 1 2 3 4 5 6 7]
      [--scaler 2.5] [--platform cpu]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--views", type=int, nargs="+",
                    default=[0, 1, 2, 3, 4, 5, 6, 7])
    ap.add_argument("--scaler", type=float, default=None,
                    help="annealed radii_backward_scaler (default: the "
                    "config's base scaler x its anneal floor)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax
    import jax.numpy as jnp

    from dss_tpu import config as config_mod
    from dss_tpu.data.dataset import MVRDataset
    from dss_tpu.geometry.cameras import cameras_from_matrix
    from dss_tpu.ops.splat_pallas import (
        _bwd_tile_budget,
        _round_up,
        _sorted_pairs,
        masked_median,
    )
    from dss_tpu.render.ewa import prepare_splats
    from dss_tpu.render.renderer import _tile_config

    cfg = config_mod.load_config(args.config)
    settings = config_mod.create_raster_settings(cfg)
    ds = MVRDataset(cfg["data"]["data_dir"])

    ck = dict(np.load(args.ckpt))
    pts = jnp.asarray(ck["params/points"])
    normals = jnp.asarray(ck["params/normals"])
    mask = jnp.asarray(ck["filters/activation"]).astype(bool)
    p = pts.shape[0]

    scaler = args.scaler
    if scaler is None:
        base = float(
            cfg["renderer"]["raster_params"].get("radii_backward_scaler", 5)
        )
        floor = float(cfg["training"].get("limit_dss_backward_radii", 1.0))
        scaler = base * floor
    tc = _tile_config(p, settings)
    tile, cap, _chunk, mt = tc[0], tc[1], tc[2], tc[3]
    bt, bcap, _, bmt, bpc = _bwd_tile_budget(tc, p)
    s = settings.image_size
    print(
        f"P={p} image={s} tile={tile} cap_fwd={cap} cap_bwd={bcap} "
        f"max_tiles fwd={mt} bwd={bmt} scaler={scaler}"
    )

    def parts(pts_screen, radii, extra, tile_size, max_t, capacity, pair_cap):
        n_tiles = (s // tile_size) ** 2
        sorted_id, starts, span = _sorted_pairs(
            pts_screen, radii, s, tile_size, max_t, max_t, extra, True
        )
        live = starts[n_tiles]
        pair_cap = min(_round_up(pair_cap, 128), p * max_t * max_t)
        trunc = jnp.maximum(live - pair_cap, 0)
        starts_t = jnp.minimum(starts, pair_cap)
        counts_full = starts_t[1:] - starts_t[:-1]
        capov = jnp.sum(jnp.maximum(counts_full - capacity, 0))
        return (int(span), int(capov), int(trunc), int(live),
                int(jnp.max(counts_full)), int(pair_cap))

    tot = {"fwd": np.zeros(3, np.int64), "bwd": np.zeros(3, np.int64)}
    for vi in range(len(args.views)):
        cam = cameras_from_matrix(
            ds.camera_mat[args.views[vi]:args.views[vi] + 1],
            **ds.cameras_params,
        )
        splats = prepare_splats(pts, normals, mask, cam, settings)
        radii = splats.radii  # (P, 2), per-axis as _sorted_pairs expects
        vis = splats.mask
        # forward table
        f = parts(splats.pts_screen, radii, 0.0, tile, mt, cap,
                  (tc[5] if tc[5] > 0 else (4 * p if p <= 20000 else 2 * p)))
        # backward table (occ): median search radius x annealed scaler
        cur_r = masked_median(
            splats.radii.reshape(-1), jnp.repeat(vis, 2)
        ) * scaler
        radii_b = radii * vis[:, None]
        pb = bpc if bpc else (10 * p if p <= 20000 else 5 * p)
        b = parts(
            jnp.where(vis[:, None], splats.pts_screen,
                      jnp.array([2.0, 2.0, -1.0])),
            radii_b, cur_r, bt, bmt, bcap, pb,
        )
        print(
            f"view {args.views[vi]}: fwd span/cap/trunc = {f[0]}/{f[1]}/{f[2]}"
            f" (live {f[3]}, max-tile {f[4]}, pair_cap {f[5]}) | "
            f"bwd = {b[0]}/{b[1]}/{b[2]} (live {b[3]}, max-tile {b[4]}, "
            f"pair_cap {b[5]})"
        )
        tot["fwd"] += np.asarray(f[:3])
        tot["bwd"] += np.asarray(b[:3])
    print(
        f"TOTAL fwd span/cap/trunc = {tot['fwd'].tolist()}  "
        f"bwd = {tot['bwd'].tolist()}"
    )


if __name__ == "__main__":
    main()
