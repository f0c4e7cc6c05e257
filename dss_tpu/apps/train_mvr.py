"""Multi-view inverse-rendering training CLI.

Reference: /root/reference/train_mvr.py — config load, dataset, icosphere
init cloud, per-group Adam (points/normals lr .01, colors lr 1.0, betas
(.5,.9)), MultiStepLR, checkpoint/resume, epoch loop with view mini-batches,
periodic chamfer eval + checkpointing, `--exit-after` time-limited runs.

Usage: python train_mvr.py --config configs/dss.yml
"""
from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dss_tpu import config as config_mod
from dss_tpu.data.dataset import ViewSampler
from dss_tpu.data.io import save_ply
from dss_tpu.training.checkpoint import CheckpointIO
from dss_tpu.models.point_model import point_model_forward
from dss_tpu.training.losses import iou_loss
from dss_tpu.training.trainer import (
    chamfer_distance,
    create_train_state,
    make_train_step,
    psnr,
)
from dss_tpu.utils.logging import MetricsLogger, get_logger

logger = get_logger("train_mvr")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train DSS-TPU multi-view inverse rendering")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--exit-after", type=int, default=-1,
                        help="checkpoint and exit(3) after this many seconds")
    parser.add_argument("--max-iters", type=int, default=-1)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu, tpu); overrides "
                             "any site-pinned jax_platforms config")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of iterations "
                             "10-15 into this directory")
    parser.add_argument("--view-weights", type=str, default=None,
                        help=".npy of per-view sampling weights (len = "
                             "#views); default uniform, as the reference")
    parser.add_argument("--prune-every", type=int, default=-1,
                        help="every N iters deactivate dead points (zero "
                             "silhouette gradient over a view batch; "
                             "reference Model.prune_points)")
    parser.add_argument("--reseed-every", type=int, default=-1,
                        help="every N iters respawn floater/inactive points "
                             "at silhouette-coverage deficits (GT-free hull "
                             "carving, models.reseed) — closes the loop the "
                             "reference's prune+repulsion machinery implies "
                             "but never closes")
    parser.add_argument("--reseed-max", type=int, default=64,
                        help="max points respawned per reseed event")
    parser.add_argument("--reseed-views", type=int, default=16,
                        help="evenly spaced views rendered for deficit "
                             "detection at each reseed event")
    parser.add_argument("--data-dir", type=str, default=None,
                        help="override cfg data.data_dir (run the same "
                             "recipe on another dataset without editing "
                             "configs)")
    parser.add_argument("--name", type=str, default=None,
                        help="override cfg name (output subdirectory)")
    parser.add_argument("--steps-per-dispatch", type=int, default=-1,
                        help="run N train steps per device dispatch (one "
                             "lax.scan program): amortizes the TPU-relay "
                             "dispatch latency.  -1 = auto (largest divisor "
                             "of steps_per_epoch <= print_every); 1 = the "
                             "classic one-dispatch-per-step loop")
    args = parser.parse_args(argv)

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)

    t_start = time.time()
    cfg = config_mod.load_config(args.config)
    if args.data_dir is not None:
        cfg["data"]["data_dir"] = args.data_dir
    if args.name is not None:
        cfg["name"] = args.name
    out_dir = os.path.join(cfg["training"]["out_dir"], cfg["name"])
    os.makedirs(out_dir, exist_ok=True)
    config_mod.save_config(cfg, os.path.join(out_dir, "config.yaml"))
    mlog = MetricsLogger(out_dir)

    # Data ------------------------------------------------------------------
    # Depth supervision needs the dense depth maps AND a depth-carrying
    # render path — wire both from the single lambda_dr_depth knob.  Default
    # source: the lean weighted-depth channel (depth_channel, full kernel
    # speed); set lean_fragments=False explicitly in the config to use the
    # fragment zbuf instead.
    use_depth = float(cfg["training"].get("lambda_dr_depth", 0.0)) > 0
    if use_depth:
        cfg["data"]["load_dense_depth"] = True
        rp = cfg["renderer"]["raster_params"]
        if rp.get("lean_fragments", True):
            rp.setdefault("depth_channel", True)
    dataset = config_mod.create_dataset(cfg)
    logger.info("dataset: %d views at %s", len(dataset), dataset.resolution)

    # Model -----------------------------------------------------------------
    rng = np.random.default_rng(args.seed)
    params, learn = config_mod.create_model_params(cfg, rng)
    settings = config_mod.create_raster_settings(cfg)
    tcfg = config_mod.create_train_config(cfg)
    schedule = config_mod.create_anneal_schedule(cfg)
    steps_per_epoch = max(len(dataset) // int(cfg["training"]["batch_size"]), 1)
    optimizer = config_mod.create_optimizer(
        cfg, learn, steps_per_epoch=steps_per_epoch
    )
    state = create_train_state(params, optimizer)

    # Resume ----------------------------------------------------------------
    ckpt = CheckpointIO(out_dir)
    resume_name = cfg["training"].get("resume_from", "model.npz")
    epoch_it, it = 0, 0
    metric_best = float("inf")
    try:
        state, scalars = ckpt.load(resume_name, state)
        epoch_it = int(scalars.get("epoch_it", 0))
        it = int(scalars.get("it", 0))
        metric_best = float(scalars.get("loss_val_best", float("inf")))
        logger.info("resumed from %s at it=%d", resume_name, it)
    except FileNotFoundError:
        pass

    train_step = make_train_step(optimizer, settings, tcfg, schedule)

    # Device-resident dataset: the TPU sits behind a network relay, so
    # shipping each 8-view 512² batch (~34 MB) per step dominated the step
    # time (measured 0.6 s/it vs a 60 ms compute step).  Upload all views
    # once (128 views @ 512² ≈ 0.5 GB of 16 GB HBM) and gather the batch
    # on-device from indices.
    all_img = jnp.asarray(dataset.images)
    all_mask = jnp.asarray(dataset.masks)
    all_depth = jnp.asarray(dataset.depths) if use_depth else None
    all_cams = dataset.get_cameras(None)
    all_lights = dataset.get_lights(None)
    all_mask_plain = None
    if settings.tiled_io:
        # Tile the loss targets ONCE at upload (they are constant for the
        # whole run): after this, images never leave the rasterizer's tile
        # order on the hot path — the untile/re-tile transposes vanish from
        # every step.  The untiled mask is kept for the in-mask point
        # sampling (row/col bilinear lookup).
        from dss_tpu.ops.splat_pallas import tile_images

        tile = min(settings.tile_size, settings.image_size)
        all_mask_plain = all_mask
        all_img = tile_images(all_img, tile)
        all_mask = tile_images(all_mask, tile)
        if all_depth is not None:
            # depth targets ride the same tile order as the weighted-depth
            # channel's predictions (depth_l1_loss is layout-agnostic)
            all_depth = tile_images(all_depth, tile)

    @functools.partial(jax.jit, static_argnames="k")
    def train_steps_device(state, all_img, all_mask, all_depth, all_cams,
                           all_lights, epoch_idx, k: int = 1):
        # The whole epoch's batch indices live on-device; each step selects
        # its batch with the (on-device) step counter.  Uploading one (B,)
        # index array per iteration over the TPU network relay measured
        # ~15 ms/step of host gap (62 ms device vs 80 ms wall).  k steps run
        # as ONE lax.scan dispatch (the remaining per-dispatch relay latency
        # amortizes over k; requires k | steps_per_epoch so a dispatch never
        # crosses an epoch-permutation boundary).
        def body(st, _):
            idx = epoch_idx[st.step % epoch_idx.shape[0]]
            take = lambda x: jnp.take(x, idx, axis=0)
            cams = jax.tree_util.tree_map(take, all_cams)
            lights = (
                None
                if all_lights is None
                else jax.tree_util.tree_map(take, all_lights)
            )
            depth = None if all_depth is None else take(all_depth)
            mask_plain = (
                None
                if all_mask_plain is None
                else jnp.take(all_mask_plain, idx, axis=0)
            )
            return train_step(st, cams, lights, take(all_img),
                              take(all_mask), depth, mask_plain)

        state, ms = jax.lax.scan(body, state, None, length=k)
        # Report the window's LAST metrics, except the safety signals which
        # aggregate over the window: a NaN-skip or budget overflow anywhere
        # in the dispatch must stay visible to the host-side warnings.
        metrics = jax.tree_util.tree_map(lambda x: x[-1], ms)
        if "params_finite" in metrics:
            metrics["params_finite"] = jnp.all(ms["params_finite"])
        if "bin_overflow" in metrics:
            metrics["bin_overflow"] = jnp.sum(ms["bin_overflow"])
        return state, metrics

    batch_size = int(cfg["training"]["batch_size"])
    # Per-view sampling weights (reference train_mvr.py:148-153 ships the
    # WeightedSubsetRandomSampler with uniform weights; the knob is exposed
    # here the same way — optional .npy with one weight per view).
    view_weights = None
    if args.view_weights:
        view_weights = np.load(args.view_weights)
        if view_weights.shape != (len(dataset),):
            raise ValueError(
                f"--view-weights must have shape ({len(dataset)},), "
                f"got {view_weights.shape}"
            )
    sampler = ViewSampler(
        len(dataset), batch_size, seed=args.seed, weights=view_weights
    )
    print_every = int(cfg["training"].get("print_every", 10))
    ckpt_every = int(cfg["training"].get("checkpoint_every", 500))
    validate_every = int(cfg["training"].get("validate_every", 500))
    visualize_every = int(cfg["training"].get("visualize_every", -1))
    # Multi-step dispatch width: k consecutive steps run as ONE device
    # program (lax.scan), so the relay's per-dispatch latency is paid once
    # per k iterations.  k must divide steps_per_epoch (a dispatch never
    # crosses an epoch re-permutation); auto picks the largest such divisor
    # that keeps the print cadence responsive.  Periodic host events
    # (print/eval/checkpoint/prune) fire on CROSSINGS of their period, so
    # they still run when k doesn't divide the period.
    k_disp = args.steps_per_dispatch
    if k_disp <= 0:
        k_disp = 1
        for d in range(1, steps_per_epoch + 1):
            if steps_per_epoch % d == 0 and d <= max(print_every, 1):
                k_disp = d
    elif steps_per_epoch % k_disp != 0:
        raise ValueError(
            f"--steps-per-dispatch {k_disp} must divide steps_per_epoch "
            f"{steps_per_epoch}"
        )
    if k_disp > 1:
        logger.info("dispatching %d train steps per device program", k_disp)
    prof_done = False
    last_print_it = it
    vis_frames, vis_names = [], []  # cloud snapshots → vis/points_animation

    gt_points, gt_normals, _ = dataset.get_pointclouds()

    # Fixed validation view batch for image-space eval (reference eval_step,
    # trainer.py:173-212: mask IoU + rgb PSNR on rendered validation views).
    val_idx = np.arange(min(batch_size, len(dataset)))
    val_img, val_mask, val_cams, val_lights = dataset.get_batch(val_idx)
    val_img, val_mask = jnp.asarray(val_img), jnp.asarray(val_mask)
    # Dataset background color (per channel, from pixels outside the GT
    # mask): mesh-generated datasets are white-background (the pytorch3d
    # HardFlatShader blend convention the reference data-gen inherits),
    # cloud-generated ones black.  The training losses never see it (the
    # rgb loss is masked to the silhouette intersection, reference
    # trainer.py:352), but the PSNR eval compares whole images — composite
    # the prediction over this color so the metric measures the object,
    # not the background convention.  Black-background datasets get an
    # exact no-op (bg = 0).
    _out = 1.0 - val_mask[..., None]
    val_bg = jnp.sum(val_img * _out, axis=(0, 1, 2)) / jnp.maximum(
        jnp.sum(_out, axis=(0, 1, 2)), 1.0
    )
    if settings.tiled_io:
        # Predictions come back tiled; IoU/PSNR are elementwise sums, so
        # comparing in tile order is exact — tile the val targets once.
        from dss_tpu.ops.splat_pallas import tile_images

        _vt = min(settings.tile_size, settings.image_size)
        val_img = tile_images(val_img, _vt)
        val_mask = tile_images(val_mask, _vt)

    @jax.jit
    def eval_render(params, filters):
        out, _ = point_model_forward(
            params, filters, val_cams, val_lights, settings
        )
        return out["img_pred"], out["mask_img_pred"]

    def evaluate(state):
        out = {}
        rgb_pred, mask_pred = eval_render(state.params, state.filters)
        out["iou_loss"] = float(iou_loss(mask_pred, val_mask))
        # composite over the dataset background (tiled layout: rgb
        # (V, n_tiles, 3, tt), mask (V, n_tiles, tt); untiled: (V, S, S, 3)
        # and (V, S, S))
        if settings.tiled_io:
            rgb_comp = rgb_pred + (1.0 - mask_pred[:, :, None, :]) * val_bg[
                None, None, :, None
            ]
        else:
            rgb_comp = rgb_pred + (1.0 - mask_pred[..., None]) * val_bg
        out["psnr"] = float(psnr(rgb_comp, val_img))
        if gt_points is None:
            return out
        cd, cn = chamfer_distance(
            jnp.asarray(gt_points),
            state.params.points,
            None if gt_normals is None else jnp.asarray(gt_normals),
            state.params.normals,
            y_mask=state.filters.activation,
        )
        out["chamfer_point"] = float(cd)
        if cn is not None:
            out["chamfer_normal"] = float(cn)
        return out

    # Train loop -------------------------------------------------------------
    # --max-iters is the authoritative stop; widen the epoch range so the
    # default --epochs cap can never silently truncate a resumed run short of
    # it (E21 resumed at it=16152 and exited after one epoch at the 1000 cap).
    if args.max_iters > 0:
        needed = epoch_it + -(-max(args.max_iters - it, 0) // steps_per_epoch) + 1
        args.epochs = max(args.epochs, needed)
    t_iter = time.time()
    stop = False
    epoch = epoch_it
    # Host mirror of the on-device step counter: the device step selects its
    # batch as epoch_idx[state.step % steps], so the host must derive the
    # SAME phase (one sync here, then lock-step increments) — a loop counter
    # desynchronizes after a mid-epoch resume and pruning would test
    # gradients on a different view batch than the one trained (ADVICE r2).
    device_step = int(state.step)
    for epoch in range(epoch_it, args.epochs):
        if stop:
            break
        epoch_np = sampler.epoch_batches()
        # The device step selects its batch as epoch_idx[state.step % steps]
        # — that phase only matches the host loop while epochs are constant
        # length and state.step advances exactly once per iteration.
        assert epoch_np.shape[0] == steps_per_epoch, (
            f"sampler epoch length {epoch_np.shape[0]} != steps_per_epoch "
            f"{steps_per_epoch} used for the LR schedule"
        )
        epoch_idx_dev = jnp.asarray(epoch_np, jnp.int32)  # ONE upload/epoch
        for _disp in range(epoch_np.shape[0] // k_disp):
            if args.profile_dir and not prof_done and it >= 10:
                jax.profiler.start_trace(args.profile_dir)
            state, metrics = train_steps_device(
                state, all_img, all_mask, all_depth, all_cams, all_lights,
                epoch_idx_dev, k=k_disp,
            )
            if args.profile_dir and not prof_done and it >= 10:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                prof_done = True
                logger.info("profiler trace written to %s", args.profile_dir)
            prev_it = it
            it += k_disp
            device_step += k_disp
            # Host-side copy of the LAST batch the dispatch trained on (used
            # by pruning): same phase as the device's state.step % steps.
            batch_idx = epoch_np[(device_step - 1) % epoch_np.shape[0]]

            def crossed(period):
                return period > 0 and (it // period) > (prev_it // period)

            if crossed(print_every):
                dt = (time.time() - t_iter) / (it - last_print_it)
                last_print_it = it
                t_iter = time.time()
                scalars = {
                    k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0
                }
                mlog.log(it, {**scalars, "sec_per_iter": dt})
                logger.info(
                    "epoch %d it %d loss %.5f (%.3fs/it)",
                    epoch, it, scalars.get("loss", float("nan")), dt,
                )
                # Active signal, not just a logged column: nonzero means the
                # static binning budgets (bin_capacity / max_tiles_per_splat
                # / pair_cap) dropped candidates — fragments or silhouette
                # gradients were lost this step (see splat_pallas.bin_splats).
                if scalars.get("bin_overflow", 0.0) > 0:
                    logger.warning(
                        "bin_overflow=%d at it %d: binning budgets dropped "
                        "candidates — raise bin_capacity/max_tiles_per_splat"
                        "/pair_cap or gradients will silently degrade",
                        int(scalars["bin_overflow"]), it,
                    )

            if crossed(args.prune_every):
                from dss_tpu.models.point_model import prune_dead_points

                # checkpoint first: the prune gradient is a separate program
                # whose first compile can exceed an --exit-after window
                ckpt.save(resume_name, state, epoch_it=epoch, it=it,
                          loss_val_best=metric_best)
                # half-resolution render is sufficient for the zero-gradient
                # test and compiles much faster
                _, mask_img, cameras, _ = dataset.get_batch(batch_idx)
                prune_settings = settings.replace(
                    image_size=max(64, settings.image_size // 2),
                    tiled_io=False,  # the zero-grad test compares vs plain masks
                )
                small = jax.image.resize(
                    jnp.asarray(mask_img),
                    (mask_img.shape[0],) + (prune_settings.image_size,) * 2,
                    "nearest",
                )
                active = prune_dead_points(
                    state.params, state.filters, cameras, prune_settings, small
                ) & state.filters.activation
                n_active = int(active.sum())
                state = state.replace(
                    filters=state.filters.replace(activation=active)
                )
                logger.info("pruned to %d active points", n_active)
                mlog.log(it, {"n_active_points": float(n_active)})

            if crossed(args.reseed_every):
                from dss_tpu.models.point_model import (
                    PointModelParams,
                    prune_outside_silhouette,
                    render_model,
                )
                from dss_tpu.models.reseed import reseed_coverage

                # checkpoint first: the reseed renders are separate programs
                # whose first compile can exceed an --exit-after window
                ckpt.save(resume_name, state, epoch_it=epoch, it=it,
                          loss_val_best=metric_best)
                # donors = floaters (outside the silhouette in >9% of views
                # — geometrically wrong) first, then pruned-inactive slots
                keep = np.asarray(prune_outside_silhouette(
                    state.params.points, all_cams, jnp.asarray(dataset.masks)
                ))
                act = np.asarray(state.filters.activation).copy()
                donors = np.concatenate([
                    np.nonzero(act & ~keep)[0],
                    np.nonzero(~act)[0],
                ])
                if donors.size == 0:
                    logger.info("reseed: no donors (no floaters/inactive)")
                else:
                    vsel = np.unique(np.linspace(
                        0, len(dataset) - 1,
                        min(args.reseed_views, len(dataset)),
                    ).round().astype(int))
                    _, msk_v, cams_v, _lights_v = dataset.get_batch(vsel)
                    rs_settings = settings.replace(tiled_io=False)
                    alpha = render_model(
                        state.params,
                        state.filters.replace(
                            activation=jnp.asarray(act & keep)
                        ),
                        cams_v, None, rs_settings,
                    )[..., 3]
                    proposals, near = reseed_coverage(
                        state.params.points,
                        jnp.asarray(act & keep),
                        cams_v,
                        jnp.asarray(msk_v),
                        alpha,
                        n_new=min(args.reseed_max, donors.size),
                    )
                    k_new = proposals.shape[0]
                    if k_new == 0:
                        logger.info("reseed: no coverage deficit found")
                    else:
                        donor_sel = donors[:k_new]
                        p_total = state.params.points.shape[0]
                        pts_np = np.asarray(state.params.points).copy()
                        nrm_np = np.asarray(state.params.normals).copy()
                        col_np = np.asarray(state.params.colors).copy()
                        pts_np[donor_sel] = proposals
                        nrm_np[donor_sel] = nrm_np[near]
                        col_np[donor_sel] = col_np[near]

                        def zero_donor_rows(x):
                            a = np.asarray(x)
                            if a.ndim >= 1 and a.shape[0] == p_total:
                                a = a.copy()
                                a[donor_sel] = 0
                                return jnp.asarray(a)
                            return x

                        act[donor_sel] = True
                        state = state.replace(
                            params=PointModelParams(
                                points=jnp.asarray(pts_np),
                                normals=jnp.asarray(nrm_np),
                                colors=jnp.asarray(col_np),
                            ),
                            opt_state=jax.tree_util.tree_map(
                                zero_donor_rows, state.opt_state
                            ),
                            filters=state.filters.replace(
                                activation=jnp.asarray(act)
                            ),
                        )
                        logger.info(
                            "reseeded %d points into coverage deficits "
                            "(%d donor floaters/inactive available)",
                            k_new, donors.size,
                        )
                        mlog.log(it, {"n_reseeded": float(k_new)})

            if crossed(visualize_every):
                act = np.asarray(state.filters.activation)
                vis_frames.append(np.asarray(state.params.points)[act])
                vis_names.append(f"it {it}")

            if crossed(validate_every):
                eval_dict = evaluate(state)
                if eval_dict:
                    mlog.log(it, {("val/" + k): v for k, v in eval_dict.items()})
                    logger.info("eval %s", eval_dict)
                    metric = eval_dict.get("chamfer_point", float("inf"))
                    if metric < metric_best:
                        metric_best = metric
                        ckpt.save("model_best.npz", state, epoch_it=epoch, it=it,
                                  loss_val_best=metric_best)

            if crossed(ckpt_every):
                ckpt.save(resume_name, state, epoch_it=epoch, it=it,
                          loss_val_best=metric_best)

            if args.exit_after > 0 and time.time() - t_start > args.exit_after:
                logger.info("exit-after reached; checkpointing and exiting(3)")
                ckpt.save(resume_name, state, epoch_it=epoch, it=it,
                          loss_val_best=metric_best)
                raise SystemExit(3)

            if args.max_iters > 0 and it >= args.max_iters:
                stop = True
                break

    # Final artifacts ---------------------------------------------------------
    ckpt.save(resume_name, state, epoch_it=epoch, it=it,
              loss_val_best=metric_best)
    active = np.asarray(state.filters.activation)
    save_ply(
        os.path.join(out_dir, cfg["training"].get("point_file", "shape_pts.ply")),
        np.asarray(state.params.points)[active],
        normals=np.asarray(state.params.normals)[active],
    )
    if vis_frames:
        from dss_tpu.utils.visualize import animate_points

        act = np.asarray(state.filters.activation)
        vis_frames.append(np.asarray(state.params.points)[act])
        vis_names.append(f"it {it} (final)")
        animate_points(
            vis_frames,
            names=vis_names,
            save_html=os.path.join(out_dir, "vis", "points_animation.html"),
            save_gif=os.path.join(out_dir, "vis", "points_animation.gif"),
            title=cfg.get("name", "dss_tpu training"),
        )
        logger.info("wrote %s", os.path.join(out_dir, "vis"))
    logger.info("done: %d iters, best chamfer %.6f", it, metric_best)
    return state


if __name__ == "__main__":
    main()
