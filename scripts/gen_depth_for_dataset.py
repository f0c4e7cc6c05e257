"""Backfill dense per-view depth maps for an existing MVR dataset.

Renders the GT geometry's nearest-fragment depth for the dataset's OWN
cameras (data_dict.npz camera_mat) — exactly what apps/create_mvr_data now
writes at generation time (depth/%06d.npy, background = zfar; reference
serves img.depth, dataset.py:71-75).  Needed because regenerating a dataset
re-samples random cameras, which would orphan checkpoints trained on it.

Usage: python scripts/gen_depth_for_dataset.py --data /tmp/yoga6_data \
    --mesh /root/reference/example_data/pointclouds/yoga6_out.ply \
    [--platform cpu]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--mesh", required=True)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from dss_tpu.data.io import read_ply
    from dss_tpu.geometry.cameras import cameras_from_matrix
    from dss_tpu.geometry.normals import estimate_normals
    from dss_tpu.render.ewa import RasterSettings, compute_vrk_h_isotropic
    from dss_tpu.render.mesh_raster import render_mesh_flat
    from dss_tpu.render.renderer import render_single_view

    dd = np.load(os.path.join(args.data, "data_dict.npz"), allow_pickle=True)
    cp = dd["cameras_params"].item() if "cameras_params" in dd else {}
    cams = cameras_from_matrix(np.asarray(dd["camera_mat"], np.float32), **cp)
    zfar = float(np.asarray(cams.zfar)[0])
    mask_dir = os.path.join(args.data, "mask")
    mask0 = imageio.imread(
        os.path.join(mask_dir, sorted(os.listdir(mask_dir))[0])
    )
    image_size = mask0.shape[0]

    mesh = read_ply(args.mesh)
    verts = mesh.points.astype(np.float64)
    # identical normalization to create_mvr_data (reference
    # create_mvr_data_from_mesh.py:122-126)
    center = (verts.max(0) + verts.min(0)) / 2.0
    verts = verts - center
    verts = (verts / np.linalg.norm(verts, axis=-1).max()).astype(np.float32)
    verts_j = jnp.asarray(verts)

    if mesh.faces is None:
        cloud_mask = jnp.ones((verts_j.shape[0],), bool)
        normals = (
            jnp.asarray(mesh.normals)
            if mesh.normals is not None
            else estimate_normals(
                verts_j, cloud_mask, neighborhood_size=8,
                reference_normals=verts_j,
            )
        )
        colors = jnp.full_like(verts_j, 0.8)
        st = RasterSettings(
            image_size=image_size, points_per_pixel=5, cutoff_threshold=1.0,
            Vrk_isotropic=True, backface_culling=True, lean_fragments=False,
        )
        vrk_h = jax.jit(compute_vrk_h_isotropic)(verts_j, cloud_mask)

        @jax.jit
        def render_depth(cam):
            _, frags, _ = render_single_view(
                verts_j, normals, colors, cloud_mask, cam, None, st,
                vrk_h=vrk_h,
            )
            return frags.zbuf[..., 0]
    else:
        faces_j = jnp.asarray(mesh.faces)

        @jax.jit
        def render_depth(cam):
            _, zbuf = render_mesh_flat(
                verts_j, faces_j, cam, None, image_size, return_zbuf=True
            )
            return zbuf

    out_dir = os.path.join(args.data, "depth")
    os.makedirs(out_dir, exist_ok=True)
    n = cams.R.shape[0]
    for i in range(n):
        cam_i = jax.tree_util.tree_map(lambda x: x[i : i + 1], cams)
        zbuf = np.asarray(render_depth(cam_i))[0]
        depth = np.where(zbuf > 0.0, zbuf, np.float32(zfar))
        np.save(os.path.join(out_dir, "%06d.npy" % i), depth.astype(np.float32))
        if (i + 1) % 16 == 0:
            print("view %d/%d" % (i + 1, n), flush=True)
    print("wrote %d depth maps to %s" % (n, out_dir))


if __name__ == "__main__":
    main()
