"""Dataset + config system tests (hermetic: builds a tiny on-disk dataset)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dss_tpu import config as config_mod
from dss_tpu.data.dataset import MVRDataset, ViewSampler
from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
from dss_tpu.render.ewa import RasterSettings
from dss_tpu.render.renderer import render_views
from tests.test_render import fibonacci_sphere


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    import imageio.v2 as imageio

    pts = jnp.asarray(fibonacci_sphere(400, 0.5))
    normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    colors = jnp.full_like(pts, 0.6)
    mask = jnp.ones((400,), bool)
    v = 4
    r, t = look_at_view_transform(
        dist=jnp.full((v,), 2.0),
        elev=jnp.linspace(0, 30, v),
        azim=jnp.linspace(0, 270, v),
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    # full fragments so the fixture can write the dense-depth product the
    # same way create_mvr_data does (nearest zbuf, background = zfar)
    st = RasterSettings(image_size=16, points_per_pixel=3, lean_fragments=False)
    rgba, frags, _ = render_views(pts, normals, colors, mask, cams, None, st)
    rgba = np.asarray(rgba)
    zbuf0 = np.asarray(frags.zbuf[..., 0])
    os.makedirs(root / "image")
    os.makedirs(root / "mask")
    os.makedirs(root / "depth")
    for i in range(v):
        imageio.imwrite(
            str(root / "image" / f"{i:03d}.png"),
            (np.clip(rgba[i, ..., :3], 0, 1) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            str(root / "mask" / f"{i:03d}.png"),
            (rgba[i, ..., 3] * 255).astype(np.uint8),
        )
        np.save(
            str(root / "depth" / f"{i:03d}.npy"),
            np.where(zbuf0[i] > 0, zbuf0[i], np.float32(100.0)).astype(
                np.float32
            ),
        )
    m44 = np.zeros((v, 4, 4), np.float32)
    m44[:, :3, :3] = np.asarray(r)
    m44[:, 3, :3] = np.asarray(t)
    m44[:, 3, 3] = 1
    np.savez(
        str(root / "data_dict.npz"),
        camera_mat=m44,
        points=np.asarray(pts),
        normals=np.asarray(normals),
        colors=np.asarray(colors),
        cameras_type="FoVPerspectiveCameras",
        cameras_params={"fov": 60.0, "znear": 0.1, "zfar": 100.0},
        lights_type="DirectionalLights",
        **{
            f"lights_{i}": {
                "ambient_color": np.full((1, 1, 3), 0.5, np.float32),
                "diffuse_color": np.full((1, 1, 3), 0.3, np.float32),
                "specular_color": np.zeros((1, 1, 3), np.float32),
                "direction": np.tile([[[0.0, 1.0, 0.0]]], (1, 1, 1)).astype(np.float32),
            }
            for i in range(v)
        },
    )
    return str(root), np.asarray(rgba)


class TestMVRDataset:
    def test_load_and_batch(self, tiny_dataset):
        root, rgba = tiny_dataset
        ds = MVRDataset(root)
        assert len(ds) == 4
        assert ds.resolution == (16, 16)
        np.testing.assert_allclose(
            ds.images, np.clip(rgba[..., :3], 0, 1), atol=2 / 255
        )
        img, msk, cams, lights = ds.get_batch([2, 0])
        assert img.shape == (2, 16, 16, 3)
        assert msk.shape == (2, 16, 16)
        assert cams.R.shape == (2, 3, 3)
        assert lights is not None
        assert lights.direction.shape == (2, 1, 3)
        # camera decomposition round-trips
        np.testing.assert_allclose(
            np.asarray(cams.camera_position()[0]),
            np.asarray(
                MVRDataset(root).get_cameras([2]).camera_position()[0]
            ),
            atol=1e-5,
        )

    def test_native_and_imageio_paths_agree(self, tiny_dataset):
        root, _ = tiny_dataset
        a = MVRDataset(root, use_native_loader=True)
        b = MVRDataset(root, use_native_loader=False)
        np.testing.assert_allclose(a.images, b.images, atol=1e-6)
        np.testing.assert_allclose(a.masks, b.masks, atol=1e-6)

    def test_gt_pointclouds(self, tiny_dataset):
        root, _ = tiny_dataset
        pts, normals, colors = MVRDataset(root).get_pointclouds()
        assert pts.shape == (400, 3) and normals.shape == (400, 3)

    def test_dense_depth(self, tiny_dataset):
        """load_dense_depth serves (V, H, W) f32 depth with zfar background
        (reference MVRDataset dataset.py:71-82, 205-209)."""
        root, _ = tiny_dataset
        assert MVRDataset(root).depths is None  # off by default, as upstream
        ds = MVRDataset(root, load_dense_depth=True)
        assert ds.depths is not None
        assert ds.depths.shape == (4, 16, 16)
        assert ds.depths.dtype == np.float32
        d = ds.get_depths([3, 1])
        assert d.shape == (2, 16, 16)
        # background is zfar; the object sits well inside the view frustum
        covered = ds.masks > 0.5
        assert np.all(ds.depths[~covered] == 100.0)
        assert np.all(ds.depths[covered] < 100.0)
        assert np.all(ds.depths[covered] > 0.0)


class TestViewSampler:
    def test_epoch_coverage(self):
        s = ViewSampler(10, 2, seed=0)
        idx = np.concatenate(list(s.epoch()))
        assert sorted(idx.tolist()) == list(range(10))

    def test_weighted(self):
        w = np.zeros(10)
        w[3] = 1.0
        s = ViewSampler(10, 2, seed=0, weights=w)
        idx = np.concatenate(list(s.epoch()))
        assert set(idx.tolist()) == {3}

    def test_epoch_batches_shape(self):
        s = ViewSampler(10, 4, seed=0)
        b = s.epoch_batches()
        assert b.shape == (2, 4)  # 10 // 4 full batches
        # non-divisible tail dropped, still a permutation subset
        assert len(set(b.reshape(-1).tolist())) == 8

    def test_fewer_views_than_batch(self):
        """Degenerate config must yield ONE with-replacement batch — the old
        generator yielded zero and training spun whole epochs doing nothing."""
        s = ViewSampler(3, 8, seed=0)
        b = s.epoch_batches()
        assert b.shape == (1, 8)
        assert set(b.reshape(-1).tolist()) <= {0, 1, 2}
        # generator view agrees
        assert sum(1 for _ in s.epoch()) == 1


class TestConfig:
    def test_inherit_chain(self, tmp_path):
        (tmp_path / "base.yml").write_text("name: base\ntraining:\n  batch_size: 4\n")
        (tmp_path / "child.yml").write_text(
            "inherit_from: base.yml\ntraining:\n  lambda_dr_proj: 0.5\n"
        )
        cfg = config_mod.load_config(str(tmp_path / "child.yml"))
        assert cfg["name"] == "base"
        assert cfg["training"]["batch_size"] == 4
        assert cfg["training"]["lambda_dr_proj"] == 0.5
        # defaults still merged underneath
        assert cfg["renderer"]["raster_params"]["points_per_pixel"] == 5

    def test_repo_configs_load(self):
        cfg = config_mod.load_config("configs/dss.yml")
        assert cfg["model"]["model_kwargs"]["n_points_per_cloud"] == 5000
        st = config_mod.create_raster_settings(cfg)
        assert st.Vrk_invariant and st.image_size == 512
        sched = config_mod.create_anneal_schedule(cfg)
        assert sched.steps_backward_radii == 200
        tc = config_mod.create_train_config(cfg)
        assert tc.lambda_proj == 0.01

    def test_factories(self):
        cfg = config_mod.load_config(None)
        cfg["model"]["model_kwargs"]["n_points_per_cloud"] = 300
        params, learn = config_mod.create_model_params(cfg)
        assert params.points.shape == (300, 3)
        assert learn["colors"] is False
        opt = config_mod.create_optimizer(cfg, learn)
        state = opt.init(params)  # optimizer tree builds


class TestDTUDataset:
    def test_dtu_camera_convention(self, tiny_dataset, tmp_path):
        """DTU variant reads cameras.npz world/scale mats:
        camera_mat = (scale.T @ world.T) per view (reference dataset.py:359)."""
        import shutil

        root, _ = tiny_dataset
        dst = tmp_path / "dtu"
        shutil.copytree(root, dst)
        dd = np.load(str(dst / "data_dict.npz"), allow_pickle=True)
        m44 = dd["camera_mat"]
        # world_mat = camera_mat.T (so scale=I reproduces the same matrices)
        np.savez(
            str(dst / "cameras.npz"),
            **{f"world_mat_{i}": m44[i].T for i in range(len(m44))},
            **{f"scale_mat_{i}": np.eye(4, dtype=np.float32) for i in range(len(m44))},
        )
        from dss_tpu.data.dataset import DTUDataset, MVRDataset

        dtu = DTUDataset(str(dst))
        mvr = MVRDataset(root)
        np.testing.assert_allclose(dtu.camera_mat, mvr.camera_mat, atol=1e-6)


class TestCreateMVRDataCLI:
    def test_end_to_end_mesh_products(self, tmp_path):
        """The data-gen CLI writes image/mask/depth + npz products that
        MVRDataset (with load_dense_depth) round-trips (reference
        create_mvr_data_from_mesh.py:98-102, 216-240)."""
        from dss_tpu.apps.create_mvr_data import main as gen_main
        from dss_tpu.data.io import save_ply
        from dss_tpu.geometry.shapes import ico_sphere

        verts, faces = ico_sphere(level=2, radius=0.5)
        mesh_path = str(tmp_path / "sphere.ply")
        save_ply(mesh_path, verts, faces=faces)
        out = str(tmp_path / "ds")
        gen_main([
            "--mesh", mesh_path, "--out", out, "--num-cameras", "3",
            "--image-size", "16", "--n-points", "200", "--platform", "cpu",
        ])
        ds = MVRDataset(out, load_dense_depth=True, use_native_loader=False)
        assert len(ds) == 3
        assert ds.depths.shape == (3, 16, 16)
        zfar = 100.0
        covered = ds.masks > 0.5
        assert covered.any()
        assert np.all(ds.depths[~covered] == zfar)
        assert np.all(ds.depths[covered] < zfar)
        # depth is view-space distance: inside the sampled camera dist range
        # (1.2-2.2) ± the unit-sphere-normalized mesh radius
        assert ds.depths[covered].min() > 0.2
        assert ds.depths[covered].max() < 3.3
        pts, normals, _ = ds.get_pointclouds()
        assert pts.shape == (200, 3)


class TestTrainCLIDispatch:
    def test_scan_dispatch_matches_per_step(self, tiny_dataset, tmp_path):
        """Multi-step dispatch (k train steps per device program via
        lax.scan, train_mvr --steps-per-dispatch) is a pure batching of the
        SAME math: the on-device batch phase is state.step % steps_per_epoch
        either way, so k=4 must land on the same final parameters as k=1
        (scan only changes program structure, not the update sequence)."""
        import yaml

        from dss_tpu.apps.train_mvr import main as train_main

        root, _ = tiny_dataset

        def run(k, name):
            cfg = {
                "name": name,
                "data": {"data_dir": root, "type": "MVR"},
                "model": {
                    "type": "point",
                    "model_kwargs": {
                        "learn_colors": True,
                        "learn_normals": True,
                        "learn_points": True,
                        "n_points_per_cloud": 120,
                    },
                },
                "renderer": {
                    "raster_params": {
                        "image_size": 16,
                        "points_per_pixel": 3,
                        "cutoff_threshold": 1.0,
                        "radii_backward_scaler": 10.0,
                    }
                },
                "training": {
                    "batch_size": 1,  # 4 views -> 4 steps/epoch, k=4 divides
                    "out_dir": str(tmp_path / "exp"),
                    "print_every": 100,
                    "validate_every": -1,
                    "visualize_every": -1,
                    "checkpoint_every": 100,
                    "lambda_dr_repel": 0.01,
                    "lambda_dr_proj": 0.01,
                },
            }
            cfg_path = tmp_path / f"{name}.yml"
            cfg_path.write_text(yaml.safe_dump(cfg))
            train_main([
                "--config", str(cfg_path), "--max-iters", "8",
                "--platform", "cpu", "--steps-per-dispatch", str(k),
                "--seed", "0",
            ])
            ck = np.load(tmp_path / "exp" / name / "model.npz")
            return {key: ck[key] for key in ck.files if key.startswith("params/")}

        p1 = run(1, "disp1")
        p4 = run(4, "disp4")
        assert set(p1) == set(p4)
        for key in p1:
            np.testing.assert_allclose(
                p1[key], p4[key], atol=1e-5, rtol=1e-5, err_msg=key
            )

    def test_reseed_every_respawns_points(self, tiny_dataset, tmp_path):
        """--reseed-every respawns floater/inactive points at coverage
        deficits inside the train loop: point count stays static (jit
        shapes), respawned rows move, their Adam moments reset, and the
        run completes."""
        import yaml

        from dss_tpu.apps.train_mvr import main as train_main

        root, _ = tiny_dataset
        cfg = {
            "name": "reseed_cli",
            "data": {"data_dir": root, "type": "MVR"},
            "model": {
                "type": "point",
                "model_kwargs": {
                    "learn_colors": False,
                    "learn_normals": True,
                    "learn_points": True,
                    "n_points_per_cloud": 120,
                },
            },
            "renderer": {
                "raster_params": {
                    "image_size": 16,
                    "points_per_pixel": 3,
                    "cutoff_threshold": 1.0,
                    "radii_backward_scaler": 10.0,
                }
            },
            "training": {
                "batch_size": 2,
                "out_dir": str(tmp_path / "exp"),
                "print_every": 100,
                "validate_every": -1,
                "visualize_every": -1,
                "checkpoint_every": 100,
            },
        }
        cfg_path = tmp_path / "reseed_cli.yml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        # stage 1: a short run to materialize a checkpoint
        train_main([
            "--config", str(cfg_path), "--max-iters", "2",
            "--platform", "cpu", "--seed", "0",
        ])
        ck_path = tmp_path / "exp" / "reseed_cli" / "model.npz"
        ck = dict(np.load(ck_path))
        # sabotage: relocate a whole spatial cap to a floater cluster —
        # creates donors (floaters) AND a silhouette-coverage hole at once
        pts = ck["params/points"].copy()
        # most of the sphere: at 16 px even a large hole is otherwise
        # covered by the neighbors' splat support
        cap = pts[:, 0] > -0.2
        assert cap.sum() >= 10, cap.sum()
        pts[cap] = np.array([3.0, 3.0, 3.0], np.float32)
        ck["params/points"] = pts
        np.savez(ck_path, **ck)
        # stage 2: resume; the reseed event must claim the floaters and
        # respawn them at silhouette-coverage deficits
        train_main([
            "--config", str(cfg_path), "--max-iters", "6",
            "--platform", "cpu", "--seed", "0",
            "--reseed-every", "4", "--reseed-views", "4",
            "--reseed-max", "16",
        ])
        ck2 = np.load(ck_path)
        p2 = ck2["params/points"]
        assert p2.shape == (120, 3)  # static point count (jit shapes)
        # respawned rows left the floater cluster (not all may be claimed —
        # reseed-max 16)
        moved = np.linalg.norm(
            p2[cap] - np.array([3.0, 3.0, 3.0]), axis=-1
        )
        assert (moved > 1.0).sum() >= 4, moved
        mlog = (tmp_path / "exp" / "reseed_cli" / "metrics.jsonl").read_text()
        assert "n_reseeded" in mlog, "reseed event never fired/logged"

    def test_reseed_coverage_grow_and_resume(self, tiny_dataset, tmp_path):
        """apps/reseed_coverage GROWS the cloud (hull-carved respawns at
        silhouette-coverage deficits, extend_checkpoint pads Adam moments/
        filters) and train_mvr resumes from the grown checkpoint: restored
        array shapes come from the checkpoint, not the config's
        n_points_per_cloud template (the flagship reseed-settle path)."""
        import yaml

        from dss_tpu.apps.reseed_coverage import main as reseed_main
        from dss_tpu.apps.train_mvr import main as train_main

        root, _ = tiny_dataset
        cfg = {
            "name": "reseed_grow",
            "data": {"data_dir": root, "type": "MVR"},
            "model": {
                "type": "point",
                "model_kwargs": {
                    "learn_colors": False,
                    "learn_normals": True,
                    "learn_points": True,
                    "n_points_per_cloud": 120,
                },
            },
            "renderer": {
                "raster_params": {
                    "image_size": 16,
                    "points_per_pixel": 3,
                    "cutoff_threshold": 1.0,
                    "radii_backward_scaler": 10.0,
                }
            },
            "training": {
                "batch_size": 2,
                "out_dir": str(tmp_path / "exp"),
                "print_every": 100,
                "validate_every": -1,
                "visualize_every": -1,
                "checkpoint_every": 100,
            },
        }
        cfg_path = tmp_path / "reseed_grow.yml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        train_main([
            "--config", str(cfg_path), "--max-iters", "2",
            "--platform", "cpu", "--seed", "0",
        ])
        ck_path = tmp_path / "exp" / "reseed_grow" / "model.npz"
        ck = dict(np.load(ck_path))
        # sabotage a spatial cap into floaters => silhouette-coverage hole
        pts = ck["params/points"].copy()
        cap = pts[:, 0] > -0.2
        pts[cap] = np.array([3.0, 3.0, 3.0], np.float32)
        ck["params/points"] = pts
        np.savez(ck_path, **ck)

        reseed_main([
            "--ckpt", str(ck_path), "--data", root,
            "--out", str(ck_path), "--n-new", "16", "--views", "4",
            "--platform", "cpu",
        ])
        grown = dict(np.load(ck_path))
        n_grown = grown["params/points"].shape[0]
        assert n_grown > 120, "reseed_coverage found no deficit to fill"
        # every per-point array (incl. Adam moments) was extended in lockstep
        for key, v in grown.items():
            if v.ndim >= 1 and v.shape[0] in (120,):
                raise AssertionError(f"{key} not extended: {v.shape}")
        # the it scalar survives (the queue accounts for it via --max-iters)
        assert int(grown["__scalar__/it"]) == 2

        # resume: config still says 120 points; shapes must follow the ckpt
        train_main([
            "--config", str(cfg_path), "--max-iters", "4",
            "--platform", "cpu", "--seed", "0",
        ])
        ck2 = np.load(ck_path)
        assert ck2["params/points"].shape == (n_grown, 3)
        assert int(ck2["__scalar__/it"]) == 4
        assert np.isfinite(ck2["params/points"]).all()


class TestRefineNormalsCLI:
    def test_checkpoint_roundtrip(self, tmp_path):
        """apps/refine_normals loads a train checkpoint, replaces ONLY
        params/normals (unit-length), preserves every other key bit-exactly,
        and writes the refined PLY next to the npz."""
        from dss_tpu.apps.refine_normals import main as rn_main
        from tests.test_render import fibonacci_sphere

        pts = np.asarray(fibonacci_sphere(200, 0.5), np.float32)
        gt_n = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        rng = np.random.default_rng(3)
        noisy = gt_n + 0.3 * rng.standard_normal(gt_n.shape).astype(np.float32)
        noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True)
        ck_path = tmp_path / "model.npz"
        np.savez(
            ck_path,
            **{
                "params/points": pts,
                "params/normals": noisy,
                "params/colors": np.full_like(pts, 0.5),
                "filters/activation": np.ones((200,), bool),
                "it": np.int64(7),
            },
        )
        rn_main([
            "--ckpt", str(ck_path), "--platform", "cpu", "--k", "16",
        ])
        out = np.load(tmp_path / "model_jet.npz")
        assert (tmp_path / "model_jet.ply").exists()
        np.testing.assert_array_equal(out["params/points"], pts)
        np.testing.assert_array_equal(out["it"], 7)
        refined = out["params/normals"]
        assert refined.shape == noisy.shape
        np.testing.assert_allclose(
            np.linalg.norm(refined, axis=-1), 1.0, atol=1e-5
        )
        # refined field is closer to the analytic sphere normals
        def err(n):
            return np.mean(1.0 - np.abs(np.sum(n * gt_n, axis=-1)))
        assert err(refined) < 0.5 * err(noisy)
