"""Data-generation CLI: render GT multi-view images from a mesh.

Reference: scripts/create_mvr_data_from_mesh.py (74-255) — load mesh,
normalize to unit sphere, random look-at cameras (dist 1.2-2.2, znear 0.1),
tri-color RGB light rig (common.py:47-89) or random single light per view
(common.py:91-121), flat-shaded mesh render per view; writes per-view
rgb/mask pngs, per-view dense depth (depth/%06d.npy — the reference writes
.exr, create_mvr_data_from_mesh.py:216-240; no EXR codec ships in this
environment, so the product is float32 .npy with the same semantics:
view-space depth, background = zfar), data_dict.npz (camera_mat, lights_%d,
GT sampled cloud) and cameras.npz.

Usage:
  python -m dss_tpu.apps.create_mvr_data --mesh bunny.ply --out data/bunny \
      --num-cameras 16 --image-size 256 [--tri-color-lights]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def tri_color_light_rig(cam_pos: np.ndarray, rng: np.random.Generator,
                        point_lights: bool = True, has_specular: bool = False):
    """Three RGB lights on the half dome, rotated into a random frame around
    the camera axis (reference common.py:47-89).  Returns dict of (L, 3)."""
    elev = np.deg2rad(np.array([30.0, 30.0, 30.0]))
    azim = np.deg2rad(np.array([-60.0, 60.0, 180.0]))
    dirs = np.stack(
        [np.cos(elev) * np.sin(azim), np.sin(elev), np.cos(elev) * np.cos(azim)],
        axis=-1,
    )
    # random frame with up = camera direction
    up = cam_pos / max(np.linalg.norm(cam_pos), 1e-9)
    at = np.cross(cam_pos, rng.standard_normal(3))
    at /= max(np.linalg.norm(at), 1e-9)
    z = at
    x = np.cross(up, z); x /= max(np.linalg.norm(x), 1e-9)
    y = np.cross(z, x)
    frame = np.stack([x, y, z], axis=0)  # rows
    dirs = dirs @ frame
    diffuse = np.array([[0.0, 0.0, 0.8], [0.0, 0.8, 0.0], [0.8, 0.0, 0.0]])
    if has_specular:
        specular = 0.15 * diffuse
        diffuse = diffuse * 0.85
    else:
        specular = np.zeros_like(diffuse)
    out = {
        "ambient_color": np.tile([[0.2, 0.2, 0.2]], (3, 1)).astype(np.float32),
        "diffuse_color": diffuse.astype(np.float32),
        "specular_color": specular.astype(np.float32),
    }
    if point_lights:
        out["location"] = (dirs * 5.0).astype(np.float32)
    else:
        out["direction"] = dirs.astype(np.float32)
    return out


def random_light_rig(cam_to_world, rng: np.random.Generator,
                     point_lights: bool = True, has_specular: bool = False):
    """One random light per view, direction drawn in camera space and
    transformed to world (reference common.py:91-121)."""
    elev = np.deg2rad(rng.integers(10, 90))
    azim = np.deg2rad(rng.integers(0, 360))
    d = np.array(
        [np.cos(elev) * np.sin(azim), np.sin(elev), np.cos(elev) * np.cos(azim)]
    )
    d = d @ cam_to_world[:3, :3]
    diffuse = np.array([[0.2, 0.2, 0.2]])
    if has_specular:
        specular = 0.15 * diffuse
        diffuse = diffuse * 0.85
    else:
        specular = np.zeros_like(diffuse)
    out = {
        "ambient_color": np.array([[0.6, 0.6, 0.6]], np.float32),
        "diffuse_color": diffuse.astype(np.float32),
        "specular_color": specular.astype(np.float32),
    }
    if point_lights:
        out["location"] = (d[None] * 5.0).astype(np.float32)
    else:
        out["direction"] = d[None].astype(np.float32)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="Render GT multi-view data from a mesh")
    parser.add_argument("--mesh", required=True, help="input mesh .ply")
    parser.add_argument("--out", required=True, help="output dataset dir")
    parser.add_argument("--num-cameras", type=int, default=16)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--min-dist", type=float, default=1.2)
    parser.add_argument("--max-dist", type=float, default=2.2)
    parser.add_argument("--fov", type=float, default=60.0)
    parser.add_argument("--znear", type=float, default=0.1)
    parser.add_argument("--zfar", type=float, default=100.0)
    parser.add_argument("--n-points", type=int, default=20000, help="GT cloud samples")
    parser.add_argument("--tri-color-lights", action="store_true")
    parser.add_argument("--point-lights", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args(argv)

    import jax

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from dss_tpu.data.io import read_ply
    from dss_tpu.geometry.cameras import sample_random_cameras
    from dss_tpu.geometry.shapes import sample_points_from_mesh
    from dss_tpu.render.lighting import DirectionalLights, PointLights
    from dss_tpu.render.mesh_raster import render_mesh_flat

    rng = np.random.default_rng(args.seed)
    mesh = read_ply(args.mesh)
    is_cloud = mesh.faces is None  # point-cloud input → splat-render the GT
    verts = mesh.points.astype(np.float64)
    # normalize to unit sphere (reference create_mvr_data_from_mesh.py:122-126)
    center = (verts.max(0) + verts.min(0)) / 2.0
    verts = verts - center
    verts = verts / np.linalg.norm(verts, axis=-1).max()
    verts = verts.astype(np.float32)
    faces = mesh.faces if not is_cloud else None

    cams = sample_random_cameras(
        jax.random.PRNGKey(args.seed), args.num_cameras,
        args.min_dist, args.max_dist, fov=args.fov, znear=args.znear, zfar=args.zfar,
    )
    cam_pos = np.asarray(cams.camera_position())

    os.makedirs(os.path.join(args.out, "image"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "mask"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)

    data = {}
    m44 = np.zeros((args.num_cameras, 4, 4), np.float32)
    m44[:, :3, :3] = np.asarray(cams.R)
    m44[:, 3, :3] = np.asarray(cams.T)
    m44[:, 3, 3] = 1.0

    verts_j = jnp.asarray(verts)
    if is_cloud:
        # GT from splat rendering of the (dense) cloud itself — used when the
        # reference workload ships only a point cloud (e.g. yoga6_out.ply)
        from dss_tpu.geometry.normals import estimate_normals
        from dss_tpu.render.ewa import RasterSettings
        from dss_tpu.render.renderer import render_single_view

        cloud_mask = jnp.ones((verts_j.shape[0],), bool)
        if mesh.normals is not None:
            cloud_normals = jnp.asarray(mesh.normals)
        else:
            cloud_normals = estimate_normals(
                verts_j, cloud_mask, neighborhood_size=8, reference_normals=verts_j
            )
        cloud_colors = (
            jnp.asarray(mesh.colors)
            if mesh.colors is not None
            else jnp.full_like(verts_j, 0.8)
        )
        st = RasterSettings(
            image_size=args.image_size, points_per_pixel=5,
            cutoff_threshold=1.0, Vrk_isotropic=True, backface_culling=True,
            # full fragments: the depth product reads the nearest zbuf
            lean_fragments=False,
        )
        # cache the per-point kernel size once (the reference caches _Vrk_h,
        # rasterizer.py:359-388) — keeps the per-view render program small
        from dss_tpu.render.ewa import compute_vrk_h_isotropic

        vrk_h = jax.jit(compute_vrk_h_isotropic)(verts_j, cloud_mask)
        jax.block_until_ready(vrk_h)
        def _render_cloud(v, f, cam, lights):
            rgba, frags, _ = render_single_view(
                v, cloud_normals, cloud_colors, cloud_mask, cam, lights, st,
                vrk_h=vrk_h,
            )
            return rgba, frags.zbuf[..., 0]

        render = jax.jit(_render_cloud)
        faces_j = verts_j  # unused placeholder
    else:
        render = jax.jit(
            lambda v, f, cam, lights: render_mesh_flat(
                v, f, cam, lights, args.image_size, return_zbuf=True
            )
        )
        faces_j = jnp.asarray(faces)

    lights_type = "PointLights" if args.point_lights else "DirectionalLights"
    for i in range(args.num_cameras):
        cam_i = jax.tree_util.tree_map(lambda x: x[i : i + 1], cams)
        if args.tri_color_lights:
            rig = tri_color_light_rig(cam_pos[i], rng, args.point_lights)
        else:
            c2w = np.linalg.inv(m44[i])
            rig = random_light_rig(m44[i], rng, args.point_lights)
        if "location" in rig:
            lights = PointLights(rig["ambient_color"], rig["diffuse_color"],
                                 rig["specular_color"], rig["location"])
        else:
            lights = DirectionalLights(rig["ambient_color"], rig["diffuse_color"],
                                       rig["specular_color"], rig["direction"])
        rgba, zbuf = render(verts_j, faces_j, cam_i, lights)
        rgba, zbuf = np.asarray(rgba), np.asarray(zbuf)
        imageio.imwrite(
            os.path.join(args.out, "image", "%06d.png" % i),
            (np.clip(rgba[..., :3], 0, 1) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(args.out, "mask", "%06d.png" % i),
            (rgba[..., 3] * 255).astype(np.uint8),
        )
        # dense depth, background = zfar (reference writes
        # torch.where(mask, zbuf, zfar), create_mvr_data_from_mesh.py:216-222)
        depth = np.where(zbuf > 0.0, zbuf, np.float32(args.zfar))
        np.save(
            os.path.join(args.out, "depth", "%06d.npy" % i),
            depth.astype(np.float32),
        )
        data["lights_%d" % i] = {k: v[None] for k, v in rig.items()}
        print("view %d/%d" % (i + 1, args.num_cameras))

    if is_cloud:
        sel = rng.choice(len(verts), size=min(args.n_points, len(verts)), replace=False)
        pts = verts[sel]
        normals = (
            mesh.normals[sel].astype(np.float32)
            if mesh.normals is not None
            else np.asarray(cloud_normals)[sel]
        )
    else:
        pts, normals = sample_points_from_mesh(verts, faces, args.n_points, rng=rng)
    data.update(
        camera_mat=m44,
        points=pts,
        normals=normals,
        colors=np.ones_like(pts),
        cameras_type="FoVPerspectiveCameras",
        cameras_params={"fov": args.fov, "znear": args.znear, "zfar": args.zfar},
        lights_type=lights_type,
    )
    np.savez(os.path.join(args.out, "data_dict.npz"), **data)
    np.savez(os.path.join(args.out, "cameras.npz"),
             **{"world_mat_%d" % i: m44[i] for i in range(args.num_cameras)})
    print("wrote", args.out)


if __name__ == "__main__":
    main()
