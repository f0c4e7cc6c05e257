"""Training loop core: fully-jitted train step, annealing schedule, optimizer
factory, chamfer evaluation.

Reference: DSS/training/trainer.py (Trainer.train_step 214-238, compute_loss
275-312, calc_dr_loss 332-376, calc_pcl_reg_loss 314-330, evaluate_3d 144-171)
and DSS/training/scheduler.py (TrainerScheduler 9-53).

TPU-first differences:
  - The whole step (model forward + losses + grads + optax update) is ONE jit
    program; the reference crosses Python/CUDA boundaries per op.
  - The annealed radii_backward_scaler and λ_proj multipliers are *traced*
    functions of the iteration counter, so annealing never recompiles
    (reference mutates raster_settings in place, scheduler.py:36-53).
  - NaN guard: instead of dropping into pdb (DSS/utils/__init__.py:51-65) the
    update is skipped (old params kept) and a flag is returned.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dss_tpu.geometry.knn import knn_points, masked_gather
from dss_tpu.geometry.pointclouds import PointFilters
from dss_tpu.models.point_model import PointModelParams, point_model_forward
from dss_tpu.render.ewa import RasterSettings
from dss_tpu.training.losses import (
    build_knn,
    dr_loss,
    normal_consistency_loss,
    projection_loss,
    repulsion_loss,
)
from dss_tpu.utils.mathutil import eps_denom, normalize


@struct.dataclass
class AnnealSchedule:
    """Iteration-driven annealing (reference TrainerScheduler,
    scheduler.py:9-53): every `steps_backward_radii` iters the occupancy
    gradient support shrinks by gamma, floored at the limit; λ_proj grows by
    gamma_proj capped at limit_proj (closed form of the reference's in-place
    compounding)."""

    init_backward_radii: float = 10.0
    steps_backward_radii: int = struct.field(pytree_node=False, default=200)
    gamma_backward_radii: float = 0.9
    limit_backward_radii: float = 2.0
    steps_proj: int = struct.field(pytree_node=False, default=-1)
    gamma_proj: float = 5.0
    limit_proj: float = 1.0

    def backward_radii(self, it: jnp.ndarray) -> jnp.ndarray:
        if self.steps_backward_radii <= 0:
            return jnp.asarray(self.init_backward_radii)
        i = (it // self.steps_backward_radii).astype(jnp.float32)
        return jnp.maximum(
            self.init_backward_radii * self.gamma_backward_radii**i,
            self.limit_backward_radii,
        )

    def proj_scale(self, it: jnp.ndarray) -> jnp.ndarray:
        if self.steps_proj <= 0:
            return jnp.asarray(1.0)
        i = (it // self.steps_proj).astype(jnp.float32)
        return jnp.minimum(self.gamma_proj**i, self.limit_proj)


class TrainConfig(NamedTuple):
    """Loss weights + loss hyperparams (reference Trainer.__init__,
    trainer.py:72-142: λ weights, knn_k=12, filter_scale=2)."""

    lambda_rgb: float = 1.0
    lambda_silhouette: float = 1.0
    lambda_proj: float = 0.0
    lambda_repel: float = 0.0
    # Dense-depth L1 (extension: the reference serves img.depth but has no
    # depth term).  Needs a depth-carrying render path: the lean weighted-
    # depth channel (settings.depth_channel, full kernel speed) or fragment
    # zbuf (settings.lean_fragments=False); exercises the z-gradient path in
    # training (kernel depth column / rasterizer._zbuf_backward).
    lambda_depth: float = 0.0
    # Anchors learned normals to a geometric estimate of the current cloud
    # (the reference only trains normals through shading; see
    # losses.normal_consistency_loss).  normal_anchor: "pca" (plane fit) or
    # "jet" (osculating-jet fit, the in-training version of
    # apps/refine_normals — headroom on converged clouds where PCA has none).
    lambda_normal: float = 0.0
    normal_anchor: str = "pca"
    normal_anchor_k: int = 8
    knn_k: int = 12
    filter_scale: float = 2.0
    sharpness_sigma: float = 0.75


@struct.dataclass
class TrainState:
    params: PointModelParams
    opt_state: optax.OptState = struct.field(pytree_node=True)
    filters: PointFilters = struct.field(pytree_node=True)
    vrk_h: Optional[jnp.ndarray] = None
    step: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def make_optimizer(
    lr_points: float = 0.01,
    lr_normals: float = 0.01,
    lr_colors: float = 1.0,
    betas: Tuple[float, float] = (0.5, 0.9),
    milestones: Sequence[int] = (),
    gamma: float = 0.5,
) -> optax.GradientTransformation:
    """Per-group Adam + MultiStepLR (reference train_mvr.py:83-95, 128-130).
    `milestones` are in optimizer steps (the reference steps per epoch)."""

    def sched(base_lr):
        if not milestones:
            return base_lr
        return optax.piecewise_constant_schedule(
            base_lr, {int(m): gamma for m in milestones}
        )

    def adam(lr):
        return optax.adam(sched(lr), b1=betas[0], b2=betas[1])

    labels = PointModelParams(points="points", normals="normals", colors="colors")
    return optax.multi_transform(
        {"points": adam(lr_points), "normals": adam(lr_normals), "colors": adam(lr_colors)},
        labels,
    )


def create_train_state(
    params: PointModelParams, optimizer: optax.GradientTransformation
) -> TrainState:
    p = params.points.shape[0]
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        filters=PointFilters.ones(p),
        vrk_h=None,
        step=jnp.zeros((), jnp.int32),
    )


def make_loss_fn(
    settings: RasterSettings,
    cfg: TrainConfig,
    schedule: AnnealSchedule,
) -> Callable:
    """The train loss: (params, filters, cameras, lights, img, mask_img, it
    [, depth_img, mask_plain]) → (total, (metric_parts, new_filters)).
    Shared by the single-device step (make_train_step) and the shard_map
    distributed step (parallel.mesh.make_shardmap_train_step).  depth_img
    (V, S, S) is only consumed when cfg.lambda_depth > 0 (needs
    lean_fragments=False).  With settings.tiled_io, img/mask_img are the
    PRE-TILED targets (tile once at dataset upload — tile_images) and
    mask_plain carries the untiled (V, S, S) mask for the in-mask point
    sampling (point_model.sample_image_at_ndc needs row/col layout)."""

    def loss_fn(params, filters, cameras, lights, img, mask_img, it,
                depth_img=None, mask_plain=None):
        sett = settings.replace(
            radii_backward_scaler=schedule.backward_radii(it)
        )
        _validate_loss_inputs(settings, cfg, depth_img, mask_plain)
        sample_mask = mask_plain if settings.tiled_io else mask_img
        out, new_filters = point_model_forward(
            params, filters, cameras, lights, sett, mask_img=sample_mask
        )
        total, parts = _post_render_loss(
            params, filters, new_filters, out, img, mask_img, it,
            depth_img, settings, cfg, schedule,
        )
        # runtime binning-overflow counter (0 unless the pallas backend's
        # static budgets dropped candidates — then fragments/gradients were
        # lost and bin_capacity / max_tiles_per_splat must be raised)
        parts = {**parts, "bin_overflow": out["bin_overflow"]}
        return total, (parts, new_filters)

    return loss_fn


def _validate_loss_inputs(settings, cfg, depth_img, mask_plain):
    if settings.tiled_io and mask_plain is None:
        raise ValueError(
            "settings.tiled_io needs mask_plain (the untiled (V, S, S) "
            "mask) for in-mask point sampling — without it the inmask "
            "filter would silently freeze at its previous value"
        )
    if cfg.lambda_depth > 0:
        if settings.tiled_io and not settings.depth_channel:
            raise ValueError(
                "lambda_depth > 0 under tiled_io needs the weighted-"
                "depth channel (settings.depth_channel=True); the "
                "fragment zbuf path renders untiled only"
            )
        backend = settings.backend
        if backend == "auto":
            backend = (
                "pallas" if jax.default_backend() == "tpu" else "reference"
            )
        carries_depth = (
            settings.depth_channel
            or not settings.lean_fragments
            or backend == "reference"  # the spec path always carries zbuf
        )
        if depth_img is None or not carries_depth:
            raise ValueError(
                "lambda_depth > 0 needs a depth batch and a depth-"
                "carrying render path (settings.depth_channel=True for "
                "the lean path, or settings.lean_fragments=False for "
                "fragment zbuf)"
            )


def _post_render_loss(params, filters, new_filters, out, img, mask_img, it,
                      depth_img, settings, cfg, schedule):
    """Loss terms from a completed model forward — shared by the
    single-scene loss and the stacked multi-scene loss (which vmaps this
    over the scene axis; everything here is pure jnp)."""
    total, parts = dr_loss(
        img,
        out["img_pred"],
        mask_img,
        out["mask_img_pred"],
        cfg.lambda_rgb,
        cfg.lambda_silhouette,
        tiled=settings.tiled_io,
    )
    if cfg.lambda_depth > 0:
        if "depth_pred" not in out:
            raise ValueError(
                "lambda_depth > 0 needs a depth-carrying render path "
                "(settings.depth_channel=True for the lean path, or "
                "settings.lean_fragments=False for fragment zbuf)"
            )
        from dss_tpu.training.losses import depth_l1_loss

        ld = (
            depth_l1_loss(depth_img, out["depth_pred"], mask_img)
            * cfg.lambda_depth
        )
        total = total + ld
        parts = {**parts, "loss_dr_depth": ld}
    # Regularizers on the source-space cloud (trainer.py:314-330),
    # rebuild_knn=True per step.
    if cfg.lambda_proj > 0 or cfg.lambda_repel > 0:
        normals = normalize(params.normals)
        active = filters.activation
        reliable = new_filters.visibility & new_filters.inmask
        knn = build_knn(params.points, active, cfg.knn_k)
        if cfg.lambda_proj > 0:
            lp = (
                projection_loss(
                    params.points,
                    normals,
                    active,
                    visibility=new_filters.visibility,
                    reliable=reliable,
                    knn=knn,
                    filter_scale=cfg.filter_scale,
                    sharpness_sigma=cfg.sharpness_sigma,
                )
                * cfg.lambda_proj
                * schedule.proj_scale(it)
            )
            total = total + lp
            parts = {**parts, "loss_dr_proj": lp}
        if cfg.lambda_repel > 0:
            lr_ = (
                repulsion_loss(
                    params.points,
                    normals,
                    active,
                    reliable=reliable,
                    knn=knn,
                    filter_scale=cfg.filter_scale,
                    sharpness_sigma=cfg.sharpness_sigma,
                )
                * cfg.lambda_repel
            )
            total = total + lr_
            parts = {**parts, "loss_dr_repel": lr_}
    if cfg.lambda_normal > 0:
        ln = (
            normal_consistency_loss(
                params.points,
                params.normals,
                filters.activation,
                neighborhood_size=cfg.normal_anchor_k,
                anchor=cfg.normal_anchor,
            )
            * cfg.lambda_normal
        )
        total = total + ln
        parts = {**parts, "loss_dr_normal": ln}
    return total, parts


def make_stacked_loss_fn(
    settings: RasterSettings,
    cfg: TrainConfig,
    schedule: AnnealSchedule,
) -> Callable:
    """Multi-scene train loss over stacked params (leaves (S, P, ...)) and
    per-scene camera rings (leaves (S, V, ...)): the render folds the scene
    axis into ONE lean kernel launch (point_model_forward_stacked) instead
    of vmapping the Pallas entry (which lowers to a sequential XLA while
    loop over scenes); the pure-jnp loss terms vmap per scene.  Same
    signature contract as make_loss_fn with a leading scene axis on
    params/filters/cameras/images; returns the scene-mean total and parts.
    """

    def loss_fn(params, filters, cameras, lights, img, mask_img, it,
                depth_img=None, mask_plain=None):
        sett = settings.replace(
            radii_backward_scaler=schedule.backward_radii(it)
        )
        _validate_loss_inputs(settings, cfg, depth_img, mask_plain)
        sample_mask = mask_plain if settings.tiled_io else mask_img
        from dss_tpu.models.point_model import point_model_forward_stacked

        out, new_filters = point_model_forward_stacked(
            params, filters, cameras, lights, sett, mask_img=sample_mask
        )
        out_scene = {k: v for k, v in out.items() if k != "bin_overflow"}

        def per_scene(params_s, filters_s, nf_s, out_s, img_s, mask_s,
                      depth_s):
            return _post_render_loss(
                params_s, filters_s, nf_s, out_s, img_s, mask_s, it,
                depth_s, settings, cfg, schedule,
            )

        d_ax = None if depth_img is None else 0
        totals, parts = jax.vmap(
            per_scene, in_axes=(0, 0, 0, 0, 0, 0, d_ax)
        )(params, filters, new_filters, out_scene, img, mask_img, depth_img)
        parts = jax.tree_util.tree_map(jnp.mean, parts)
        parts = {**parts, "bin_overflow": out["bin_overflow"]}
        return jnp.mean(totals), (parts, new_filters)

    return loss_fn


def apply_update(
    optimizer: optax.GradientTransformation,
    state: "TrainState",
    grads,
    total,
    parts,
    new_filters,
):
    """NaN-guarded optimizer update (reference check_weights,
    utils/__init__.py:51-65): a non-finite gradient skips the whole update —
    params AND optimizer state (otherwise the Adam moments absorb the NaN
    and every later step is poisoned).  Returns (new_state, metrics)."""
    finite = jnp.all(
        jnp.array(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
        )
    )
    safe_grads = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
    )
    updates, new_opt = optimizer.update(safe_grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_params = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old), new_params, state.params
    )
    new_opt = jax.tree_util.tree_map(
        lambda new, old: (
            jnp.where(finite, new, old)
            if isinstance(new, jnp.ndarray) and new.shape == getattr(old, "shape", None)
            else new
        ),
        new_opt,
        state.opt_state,
    )
    new_state = state.replace(
        params=new_params,
        opt_state=new_opt,
        filters=new_filters,
        step=state.step + 1,
    )
    metrics = {"loss": total, "params_finite": finite, **parts}
    return new_state, metrics


def make_train_step(
    optimizer: optax.GradientTransformation,
    settings: RasterSettings,
    cfg: TrainConfig,
    schedule: AnnealSchedule,
) -> Callable:
    """Build the jitted train step: (state, cameras, lights, img, mask_img) →
    (new_state, metrics dict)."""
    loss_fn = make_loss_fn(settings, cfg, schedule)

    @jax.jit
    def train_step(state: TrainState, cameras, lights, img, mask_img,
                   depth_img=None, mask_plain=None):
        (total, (parts, new_filters)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(
            state.params,
            state.filters,
            cameras,
            lights,
            img,
            mask_img,
            state.step,
            depth_img,
            mask_plain,
        )
        return apply_update(
            optimizer, state, grads, total, parts, new_filters
        )

    return train_step


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def chamfer_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_normals: Optional[jnp.ndarray] = None,
    y_normals: Optional[jnp.ndarray] = None,
    x_mask: Optional[jnp.ndarray] = None,
    y_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Symmetric chamfer distance (squared) + normal term (1 − |cos|), the
    reference's evaluate_3d metric (trainer.py:144-171, pytorch3d
    chamfer_distance semantics)."""

    def directed(a, b, a_mask, b_mask, an, bn):
        d, idx = knn_points(a, b, a_mask, b_mask, k=1)
        d = jnp.where(jnp.isfinite(d[:, 0]), d[:, 0], 0.0)
        am = (
            jnp.ones(a.shape[:1], a.dtype)
            if a_mask is None
            else a_mask.astype(a.dtype)
        )
        cd = jnp.sum(d * am) / eps_denom(jnp.sum(am))
        cn = None
        if an is not None and bn is not None:
            nb = masked_gather(bn, idx)[:, 0, :]
            cos = jnp.abs(
                jnp.sum(normalize(an) * normalize(nb), axis=-1)
            )
            cn = jnp.sum((1.0 - cos) * am) / eps_denom(jnp.sum(am))
        return cd, cn

    cd_xy, cn_xy = directed(x, y, x_mask, y_mask, x_normals, y_normals)
    cd_yx, cn_yx = directed(y, x, y_mask, x_mask, y_normals, x_normals)
    cd = cd_xy + cd_yx
    cn = None if cn_xy is None else cn_xy + cn_yx
    return cd, cn


def psnr(img_pred: jnp.ndarray, img_gt: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB for [0, 1] images (the reference's
    bit-rotted eval_step intended IoU+PSNR, trainer.py:173-212)."""
    mse = jnp.mean((img_pred - img_gt) ** 2)
    return -10.0 * jnp.log10(eps_denom(mse))
