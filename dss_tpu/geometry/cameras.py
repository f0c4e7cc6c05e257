"""Camera models (FoV perspective), row-vector convention.

Conventions match the reference's pytorch3d cameras so the splatting math and
datasets interoperate:

- Row-vector transforms: ``x_out = [x, 1] @ M`` with M (4, 4).
- World-to-view: ``x_view = x_world @ R + T`` (R columns are the camera axes).
- Camera looks down +Z; NDC has +X pointing LEFT and +Y pointing UP
  (reference DSS/csrc/rasterize_points.cu:158-161).
- ``transform_points`` returns (ndc_x, ndc_y, view_z): XY in [-1, 1] NDC, Z kept
  as the *view-space depth* (pytorch3d PointsRasterizer.transform semantics the
  reference relies on for depth culling/merging, DSS/core/rasterizer.py:584-614).

Everything is a pure function of a pytree dataclass -> jit/vmap/pjit friendly.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dss_tpu.utils.mathutil import eps_denom, to_homogen


@struct.dataclass
class FoVPerspectiveCameras:
    """Batch of perspective cameras defined by FoV (degrees).

    Attributes (all batched on the leading axis N):
      R: (N, 3, 3) world-to-view rotation (row-vector convention).
      T: (N, 3) world-to-view translation.
      fov: (N,) vertical field of view in degrees.
      znear, zfar: (N,) clip range (view-space depth).
      aspect_ratio: (N,) width/height aspect.
    """

    R: jnp.ndarray
    T: jnp.ndarray
    fov: jnp.ndarray
    znear: jnp.ndarray
    zfar: jnp.ndarray
    aspect_ratio: jnp.ndarray

    @classmethod
    def create(
        cls,
        R: jnp.ndarray,
        T: jnp.ndarray,
        fov: float | jnp.ndarray = 60.0,
        znear: float | jnp.ndarray = 0.1,
        zfar: float | jnp.ndarray = 100.0,
        aspect_ratio: float | jnp.ndarray = 1.0,
    ) -> "FoVPerspectiveCameras":
        R = jnp.asarray(R, jnp.float32)
        T = jnp.asarray(T, jnp.float32)
        if R.ndim == 2:
            R = R[None]
        if T.ndim == 1:
            T = T[None]
        n = R.shape[0]

        def bcast(v):
            v = jnp.asarray(v, jnp.float32)
            return jnp.broadcast_to(jnp.atleast_1d(v), (n,))

        return cls(R=R, T=T, fov=bcast(fov), znear=bcast(znear), zfar=bcast(zfar),
                   aspect_ratio=bcast(aspect_ratio))

    def __len__(self) -> int:
        return self.R.shape[0]

    # ---- matrices -------------------------------------------------------

    def world_to_view_matrix(self) -> jnp.ndarray:
        """(N, 4, 4) row-vector world-to-view matrix: [[R, 0], [T, 1]]."""
        n = self.R.shape[0]
        m = jnp.zeros((n, 4, 4), jnp.float32)
        m = m.at[:, :3, :3].set(self.R)
        m = m.at[:, 3, :3].set(self.T)
        m = m.at[:, 3, 3].set(1.0)
        return m

    def projection_matrix(self) -> jnp.ndarray:
        """(N, 4, 4) row-vector FoV perspective projection (pytorch3d layout).

        [x y z 1] @ K = [s1*x, s2*y, f1*z + f2, z]  ->
        ndc = (s1*x/z, s2*y/z, f1 + f2/z).
        """
        n = self.R.shape[0]
        tanhalf = jnp.tan(jnp.deg2rad(self.fov) / 2.0)
        s1 = 1.0 / (self.aspect_ratio * tanhalf)
        s2 = 1.0 / tanhalf
        zr = eps_denom(self.zfar - self.znear)
        f1 = self.zfar / zr
        f2 = -(self.zfar * self.znear) / zr
        k = jnp.zeros((n, 4, 4), jnp.float32)
        k = k.at[:, 0, 0].set(s1)
        k = k.at[:, 1, 1].set(s2)
        k = k.at[:, 2, 2].set(f1)
        k = k.at[:, 3, 2].set(f2)
        k = k.at[:, 2, 3].set(1.0)
        return k

    def full_projection_matrix(self) -> jnp.ndarray:
        """(N, 4, 4) world -> NDC-homogeneous (row-vector): W2V @ K."""
        return self.world_to_view_matrix() @ self.projection_matrix()

    # ---- point transforms ----------------------------------------------

    def transform_points_world_to_view(self, points: jnp.ndarray) -> jnp.ndarray:
        """points (N, P, 3) or (P, 3) -> view space (N, P, 3)."""
        if points.ndim == 2:
            points = points[None]
        return points @ self.R + self.T[:, None, :]

    def transform_points_screen(self, points: jnp.ndarray) -> jnp.ndarray:
        """points (N, P, 3) or (P, 3) -> (N, P, 3) = (ndc_x, ndc_y, view_z)."""
        if points.ndim == 2:
            points = jnp.broadcast_to(points[None], (len(self),) + points.shape)
        pts_view = self.transform_points_world_to_view(points)
        m = self.full_projection_matrix()
        hom = to_homogen(points) @ m  # (N, P, 4)
        w = eps_denom(hom[..., 3:4])
        ndc_xy = hom[..., :2] / w
        return jnp.concatenate([ndc_xy, pts_view[..., 2:3]], axis=-1)

    def camera_position(self) -> jnp.ndarray:
        """(N, 3) camera centers in world space: -T @ R^T."""
        return -jnp.einsum("nj,nij->ni", self.T, self.R)

    def unproject_ndc_depth(
        self, ndc_xy: jnp.ndarray, depth: jnp.ndarray
    ) -> jnp.ndarray:
        """Inverse of transform_points_screen: (N, P, 2) NDC xy + (N, P)
        view-space depth -> (N, P, 3) world points.

        From the projection (projection_matrix docstring): ndc_x = s1·x/z,
        ndc_y = s2·y/z, so x_view = ndc_x·z/s1 etc.; then the rigid inverse
        x_world = (x_view - T) @ Rᵀ."""
        tanhalf = jnp.tan(jnp.deg2rad(self.fov) / 2.0)
        s1 = 1.0 / (self.aspect_ratio * tanhalf)
        s2 = 1.0 / tanhalf
        x = ndc_xy[..., 0] * depth / s1[:, None]
        y = ndc_xy[..., 1] * depth / s2[:, None]
        view = jnp.stack([x, y, depth], axis=-1)
        return jnp.einsum(
            "npj,nij->npi", view - self.T[:, None, :], self.R
        )


# ---- look-at construction ------------------------------------------------


def look_at_rotation(
    camera_position: jnp.ndarray,
    at: jnp.ndarray | None = None,
    up: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(N, 3, 3) rotation with columns = camera axes (pytorch3d convention:
    z from camera toward `at`, x = up × z so +X is screen-left)."""
    camera_position = jnp.atleast_2d(jnp.asarray(camera_position, jnp.float32))
    n = camera_position.shape[0]
    if at is None:
        at = jnp.zeros((n, 3), jnp.float32)
    if up is None:
        up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), (n, 3))
    at = jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(at, jnp.float32)), (n, 3))
    up = jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(up, jnp.float32)), (n, 3))

    z_axis = _norm(at - camera_position)
    x_axis = _norm(jnp.cross(up, z_axis))
    # Degenerate case: up parallel to z -> substitute an arbitrary orthogonal x.
    bad = jnp.linalg.norm(x_axis, axis=-1, keepdims=True) < 0.5
    alt = _norm(jnp.cross(jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), z_axis.shape), z_axis))
    x_axis = jnp.where(bad, alt, x_axis)
    y_axis = _norm(jnp.cross(z_axis, x_axis))
    return jnp.stack([x_axis, y_axis, z_axis], axis=-1)  # columns


def _norm(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def camera_position_from_spherical_angles(
    distance, elevation, azimuth, degrees: bool = True
) -> jnp.ndarray:
    """(N, 3) positions; elev/azim semantics match pytorch3d."""
    distance = jnp.atleast_1d(jnp.asarray(distance, jnp.float32))
    elevation = jnp.atleast_1d(jnp.asarray(elevation, jnp.float32))
    azimuth = jnp.atleast_1d(jnp.asarray(azimuth, jnp.float32))
    if degrees:
        elevation = jnp.deg2rad(elevation)
        azimuth = jnp.deg2rad(azimuth)
    x = distance * jnp.cos(elevation) * jnp.sin(azimuth)
    y = distance * jnp.sin(elevation)
    z = distance * jnp.cos(elevation) * jnp.cos(azimuth)
    return jnp.stack([x, y, z], axis=-1)


def look_at_view_transform(
    dist=1.0, elev=0.0, azim=0.0, at=None, up=None, degrees: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (R (N,3,3), T (N,3)) for world-to-view x @ R + T."""
    pos = camera_position_from_spherical_angles(dist, elev, azim, degrees)
    if at is not None:
        at = jnp.atleast_2d(jnp.asarray(at, jnp.float32))
        pos = pos + at
    r = look_at_rotation(pos, at=at, up=up)
    t = -jnp.einsum("ni,nij->nj", pos, r)
    return r, t


def sample_random_cameras(
    key: jax.Array,
    num_cams: int,
    min_dist: float,
    max_dist: float,
    at_jitter: float = 0.05,
    fov: float = 60.0,
    znear: float = 0.1,
    zfar: float = 100.0,
    sort_distances: bool = True,
) -> FoVPerspectiveCameras:
    """Random look-at cameras (reference CameraSampler, DSS/core/camera.py:6-71):
    uniform distance in [min_dist, max_dist] (sorted descending), azimuth in
    [-180, 180), elevation in [-90, 90), look-at point jittered by +-at_jitter."""
    kd, ka, ke, kj = jax.random.split(key, 4)
    dist = jax.random.uniform(kd, (num_cams,), minval=min_dist, maxval=max_dist)
    if sort_distances:
        dist = jnp.sort(dist)[::-1]
    azim = jax.random.uniform(ka, (num_cams,), minval=-180.0, maxval=180.0)
    elev = jax.random.uniform(ke, (num_cams,), minval=-90.0, maxval=90.0)
    at = jax.random.uniform(kj, (num_cams, 3), minval=-at_jitter, maxval=at_jitter)
    r, t = look_at_view_transform(dist, elev, azim, at=at)
    return FoVPerspectiveCameras.create(r, t, fov=fov, znear=znear, zfar=zfar)


def cameras_from_matrix(
    camera_mat: jnp.ndarray,
    fov: float | jnp.ndarray = 60.0,
    znear: float | jnp.ndarray = 0.1,
    zfar: float | jnp.ndarray = 100.0,
) -> FoVPerspectiveCameras:
    """Build cameras from (N, 4, 4) row-major world2view matrices as stored in
    the reference's data_dict.npz (DSS/training/trainer.py:240-273 decomposes
    camera_mat into R = m[:3,:3], T = m[3,:3])."""
    camera_mat = jnp.asarray(camera_mat, jnp.float32)
    if camera_mat.ndim == 2:
        camera_mat = camera_mat[None]
    return FoVPerspectiveCameras.create(
        camera_mat[:, :3, :3], camera_mat[:, 3, :3], fov=fov, znear=znear, zfar=zfar
    )
