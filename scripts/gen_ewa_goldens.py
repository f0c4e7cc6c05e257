"""Generate EWA-setup goldens by RUNNING the reference's own
`SurfaceSplatting._get_per_point_info` (/root/reference/DSS/core/rasterizer.py:525-565)
under torch-cpu.

This closes the last self-certification gap (VERDICT r2 §missing-2): the
rasterization semantics are already pinned by reference-CPU goldens
(scripts/gen_reference_goldens.py), but the EWA math feeding them
(dss_tpu/render/ewa.py vs reference rasterizer.py:256-565) was verified only
by transcription + unit tests, because pytorch3d is not installed.  Here the
reference module is imported with MINIMAL STUBS for the pytorch3d pieces its
import graph touches; the EWA path itself needs only
  - ops3d.knn_points      → plain-torch brute force (exact, CPU)
  - ops3d.padded_to_packed / eyes → trivial for N=1
  - gather_batch_to_packed → the reference's own pure-torch implementation
and a duck-typed camera that returns the SAME world→NDC matrix dss_tpu's
camera produces — so the goldens pin the EWA math given an identical
projection, which is the right contract (the camera convention itself is
pinned by the render goldens).

Outputs per Vrk mode (invariant / isotropic / anisotropic): radii,
ellipse_params, cutoff, scaler — all frame-invariant (Vrk = h·SkᵀSk =
h·(I−nnᵀ) and |det(Sk·WJk)| do not depend on the reference's random tangent
frame, rasterizer.py:337-341; the anisotropic Vr = T·diag(λ)·Tᵀ and |detMk|
are likewise invariant to the eigenvector signs that differ between
torch.linalg.svd and jnp.linalg.eigh).

Run: python scripts/gen_ewa_goldens.py   (CPU-only, a few seconds).
Writes tests/golden/reference_ewa_teapot.npz; pinned by
tests/test_ewa_golden.py.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "golden", "reference_ewa_teapot.npz")


# ---------------------------------------------------------------------------
# Stub modules so /root/reference/DSS/core/rasterizer.py imports cleanly.
# Only knn_points / padded_to_packed / eyes are ever CALLED on the EWA path;
# everything else exists purely to satisfy module-level imports.
# ---------------------------------------------------------------------------


def _install_stubs():
    import collections

    import torch

    # Field names follow pytorch3d's KNN result; a namedtuple keeps the
    # 3-tuple unpacking used by the isotropic path AND the `.knn` attribute
    # access used by estimate_pointcloud_local_coord_frames
    # (mathHelper.py:69-77, the anisotropic path).
    _KNNResult = collections.namedtuple("_KNNResult", ["dists", "idx", "knn"])

    def knn_points(p1, p2, lengths1=None, lengths2=None, K=1,
                   return_nn=False, **kw):
        # (N, P, 3) brute-force exact kNN, ascending — the semantics the
        # reference relies on (self at distance 0 first, rasterizer.py:317).
        d2 = torch.cdist(p1, p2) ** 2
        dists, idx = torch.topk(d2, K, dim=-1, largest=False, sorted=True)
        nn = None
        if return_nn:
            assert p2.shape[0] == 1, "golden harness is single-cloud"
            nn = p2[0][idx[0]][None]  # (1, P, K, 3)
        return _KNNResult(dists, idx, nn)

    def batch_svd(x):
        # torch-batch-svd contract: U, S (descending), V with A = U S Vᵀ —
        # exactly torch.linalg.svd with Vh transposed (mathHelper.py:84).
        u, s, vh = torch.linalg.svd(x, full_matrices=False)
        return u, s, vh.transpose(-2, -1)

    def convert_pointclouds_to_tensor(pcl):
        if torch.is_tensor(pcl):
            n = torch.full((pcl.shape[0],), pcl.shape[1], dtype=torch.int64)
            return pcl, n
        return pcl.points_padded(), pcl.num_points_per_cloud()

    def padded_to_packed(x, first_idx, total):
        assert x.shape[0] == 1, "golden harness is single-cloud"
        return x[0][:total]

    def eyes(dim, n, device=None, dtype=None):
        return (
            torch.eye(dim, device=device, dtype=dtype)
            .unsqueeze(0)
            .expand(n, dim, dim)
        )

    class _Anything:
        """Placeholder base class / callable for never-executed references."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise NotImplementedError("stub called by the golden harness")

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    p3d = mod("pytorch3d")
    ops = mod(
        "pytorch3d.ops",
        knn_points=knn_points,
        knn_gather=_Anything(),
        padded_to_packed=padded_to_packed,
        eyes=eyes,
        convert_pointclouds_to_tensor=convert_pointclouds_to_tensor,
        is_pointclouds=lambda x: False,
    )
    mod(
        "pytorch3d.ops.utils",
        convert_pointclouds_to_tensor=convert_pointclouds_to_tensor,
    )
    mod("pytorch3d.ops.points_normals", _disambiguate_vector_directions=_Anything())
    mod("pytorch3d.ops.knn", _KNN=_Anything)
    p3d.ops = ops
    structures = mod(
        "pytorch3d.structures",
        Pointclouds=_Anything,
        list_to_padded=_Anything(),
        padded_to_list=_Anything(),
    )
    p3d.structures = structures
    mod(
        "pytorch3d.transforms",
        Transform3d=_Anything,
        Scale=_Anything,
        Rotate=_Anything,
        Translate=_Anything,
    )
    renderer = mod(
        "pytorch3d.renderer",
        PointsRasterizationSettings=_Anything,
        PointsRasterizer=_Anything,
    )
    p3d.renderer = renderer
    mod("pytorch3d.renderer.cameras", look_at_rotation=_Anything())
    mod(
        "pytorch3d.renderer.utils",
        TensorProperties=_Anything,
        convert_to_tensors_and_broadcast=_Anything(),
    )
    mod("pytorch3d.renderer.points")
    mod("pytorch3d.renderer.points.rasterize_points", kMaxPointsPerBin=22)
    mod("frnn", frnn_grid_points=_Anything(), frnn_gather=_Anything(), _C=None)
    mod("torch_batch_svd", svd=batch_svd)
    mod("trimesh")
    skimage = mod("skimage")
    skimage.measure = mod("skimage.measure", marching_cubes=_Anything())
    # compiled extension: never touched by the EWA path
    mod("DSS._C")


def _load_reference_rasterizer():
    _install_stubs()
    sys.path.insert(0, REFERENCE)
    import DSS  # noqa: F401  (sets up the package; logger only)

    sys.modules["DSS._C"].__package__ = "DSS"
    import DSS.core.rasterizer as ref_rast

    return ref_rast


# ---------------------------------------------------------------------------
# Duck-typed single-cloud container + camera for the unbound reference methods
# ---------------------------------------------------------------------------


class _Cloud:
    def __init__(self, points, normals):
        import torch

        self._pts = torch.as_tensor(points, dtype=torch.float32)
        self._nrm = torch.as_tensor(normals, dtype=torch.float32)

    def points_padded(self):
        return self._pts[None]

    def points_packed(self):
        return self._pts

    def normals_packed(self):
        return self._nrm

    def num_points_per_cloud(self):
        import torch

        return torch.tensor([self._pts.shape[0]])

    def cloud_to_packed_first_idx(self):
        import torch

        return torch.tensor([0])

    def packed_to_cloud_idx(self):
        import torch

        return torch.zeros(self._pts.shape[0], dtype=torch.int64)


class _Camera:
    """Duck camera: get_full_projection_transform().get_matrix() returns the
    dss_tpu world→NDC matrix (row-vector convention, same as pytorch3d)."""

    def __init__(self, m44):
        import torch

        self._m = torch.as_tensor(np.asarray(m44), dtype=torch.float32)
        if self._m.ndim == 2:
            self._m = self._m[None]

    def get_full_projection_transform(self):
        return self

    def get_matrix(self):
        return self._m


class _Self:
    """Attribute bag standing in for a SurfaceSplatting instance."""

    def __init__(self, raster_settings, cameras):
        self.raster_settings = raster_settings
        self.cameras = cameras
        self.frnn_radius = 0  # knn path (rasterizer.py:310-319)
        self._Vrk_h = None


def teapot_inputs():
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny ops; keep off the relay
    import jax.numpy as jnp

    from dss_tpu.data.io import read_ply
    from dss_tpu.geometry.cameras import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )

    ply = read_ply(
        os.path.join(
            REFERENCE, "example_data/pointclouds/teapot_normal_dense.ply"
        )
    )
    pts = jnp.asarray(ply.points)
    center = pts.mean(0)
    scale = jnp.max(jnp.linalg.norm(pts - center, axis=-1))
    pts = (pts - center) / scale * 0.7
    normals = jnp.asarray(ply.normals)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)

    r, t = look_at_view_transform(dist=2.2, elev=18.0, azim=35.0)
    cam = FoVPerspectiveCameras.create(r, t, fov=60.0, znear=0.1, zfar=100.0)
    m44 = np.asarray(cam.full_projection_matrix())
    return {
        "points": np.asarray(pts, np.float32),
        "normals": np.asarray(normals, np.float32),
        "m44": m44.astype(np.float32),
        "R": np.asarray(cam.R, np.float32),
        "T": np.asarray(cam.T, np.float32),
        "fov": np.float32(60.0),
        "znear": np.float32(0.1),
        "zfar": np.float32(100.0),
        "image_size": np.int32(256),
        "cutoff_threshold": np.float32(1.0),
        "antialiasing_sigma": np.float32(1.0),
    }


def run_reference_ewa(ref_rast, inputs, vrk_invariant, vrk_isotropic):
    import torch

    torch.manual_seed(0)
    rs = types.SimpleNamespace(
        cutoff_threshold=float(inputs["cutoff_threshold"]),
        Vrk_invariant=vrk_invariant,
        Vrk_isotropic=vrk_isotropic,
        image_size=int(inputs["image_size"]),
        antialiasing_sigma=float(inputs["antialiasing_sigma"]),
    )
    cloud = _Cloud(inputs["points"], inputs["normals"])
    cam = _Camera(inputs["m44"])
    # Instance without __init__ (which would need real pytorch3d cameras):
    # all the EWA methods resolve on the class; state comes from _Self.
    this = ref_rast.SurfaceSplatting.__new__(ref_rast.SurfaceSplatting)
    this.__dict__.update(_Self(rs, cam).__dict__)
    with torch.no_grad():
        info = ref_rast.SurfaceSplatting._get_per_point_info(this, cloud)
    return {k: np.asarray(v, np.float32) for k, v in info.items()}


def main():
    inputs = teapot_inputs()
    ref_rast = _load_reference_rasterizer()

    out = dict(inputs)
    for name, (inv, iso) in {
        "invariant": (True, False),
        "isotropic": (False, True),
        # Vrk_invariant=False, Vrk_isotropic=False → _compute_anisotropic_Vrk
        # (rasterizer.py:256-291), the reference default.yaml default: local
        # PCA frames from batch-SVD of K=8 neighborhoods; the batch_svd stub
        # is torch.linalg.svd (exact), so this pins the third Vrk mode too.
        "anisotropic": (False, False),
    }.items():
        info = run_reference_ewa(ref_rast, inputs, inv, iso)
        for k, v in info.items():
            out[f"{name}_{k}"] = v
        print(
            f"{name}: radii mean {info['radii'].mean():.6e} "
            f"scaler mean {info['scaler'].mean():.6e} "
            f"ellipse a mean {info['ellipse_params'][:, 0].mean():.6e}"
        )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
