"""Multi-chip scale-out: shard the view batch over a device mesh.

The reference is single-GPU (SURVEY.md §1: no distributed layer); the natural
TPU parallelization of its workload (V independent camera views over one
shared point cloud, DSS/models/point_modeling.py:206-209) is data parallelism
over views:

  - mesh axis "views": cameras/lights/images/masks sharded on their leading
    (view) axis; the point cloud parameters are tiny (100k × 3 floats ≈ 1.2 MB)
    and are replicated.
  - loss/grad reductions over views become XLA psum/all-reduce over ICI —
    inserted automatically by GSPMD from the sharding annotations; no
    hand-written collectives.
  - per-point kNN / regularizer losses run replicated (cheap relative to
    rasterization), so no halo exchange is needed.

An optional second axis "pixels" shards the image rows of each view for
single-view scaling (render_single_view's row-chunk structure maps onto it).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "views") -> Mesh:
    """1-D device mesh over the first n devices.

    Raises if fewer than n_devices are available — a silently shrunk mesh
    makes "multi-chip" tests vacuously pass on one device.
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devs)} available ({jax.default_backend()} backend); "
                "for CPU testing set jax.config.update('jax_platforms','cpu') "
                "and XLA_FLAGS=--xla_force_host_platform_device_count=N "
                "before JAX device init"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_views(tree, mesh: Mesh, axis: str = "views"):
    """Place every leaf with a leading view axis on the mesh, sharded on that
    axis; scalars/replicated leaves broadcast."""

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.shape[axis] == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())), tree
    )


def make_sharded_train_step(train_step, mesh: Mesh, axis: str = "views"):
    """Wrap a jitted train step so the view batch is sharded over the mesh and
    the state stays replicated.  GSPMD propagates shardings through the render
    vmap (views axis) and inserts the gradient all-reduce over ICI."""

    def step(state, cameras, lights, img, mask_img, depth_img=None):
        state = replicate(state, mesh)
        cameras = shard_views(cameras, mesh, axis)
        img = jax.device_put(img, NamedSharding(mesh, P(axis)))
        mask_img = jax.device_put(mask_img, NamedSharding(mesh, P(axis)))
        if lights is not None:
            lights = shard_views(lights, mesh, axis)
        if depth_img is not None:
            depth_img = jax.device_put(
                depth_img, NamedSharding(mesh, P(axis))
            )
        return train_step(state, cameras, lights, img, mask_img, depth_img)

    return step


def make_shardmap_train_step(
    optimizer,
    settings,
    cfg,
    schedule,
    mesh: Mesh,
    axis: str = "views",
):
    """Distributed train step with EXPLICIT per-shard execution (shard_map):
    each device computes loss/grads on its local slice of the view batch and
    the gradients cross ICI in one hand-placed psum — by construction, not by
    hoping GSPMD partitions the pallas custom calls.  The optimizer update
    runs replicated on the pmean'd gradients, so the NaN guard and Adam
    moments stay bitwise-identical across devices.

    Semantics match make_train_step on the full batch: per-view loss means
    of equal shards pmean to the global mean; the visibility/inmask filters
    (ANY over views, point_modeling.py:172-176) OR across shards; the
    bin_overflow diagnostic sums.
    """
    import functools

    try:  # jax >= 0.8: public API; jax.experimental.shard_map is deprecated
        from jax import shard_map

        # the replication checker was renamed check_rep → check_vma; pallas
        # custom calls defeat it either way
        shard_map = functools.partial(shard_map, check_vma=False)
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        shard_map = functools.partial(shard_map, check_rep=False)

    from dss_tpu.training.trainer import apply_update, make_loss_fn

    loss_fn = make_loss_fn(settings, cfg, schedule)
    n = mesh.shape[axis]

    def local_grad(params, filters, cameras, lights, img, mask_img, it,
                   depth_img=None, mask_plain=None):
        (total, (parts, new_filters)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, filters, cameras, lights, img, mask_img, it, depth_img,
          mask_plain)
        grads = jax.lax.pmean(grads, axis)
        total = jax.lax.pmean(total, axis)
        parts = {
            k: (
                jax.lax.psum(v, axis)
                if k == "bin_overflow"
                else jax.lax.pmean(v, axis)
            )
            for k, v in parts.items()
        }
        # visibility/inmask: ANY over the global view batch = OR over shards.
        new_filters = jax.tree_util.tree_map(
            lambda m: jax.lax.psum(m.astype(jnp.int32), axis) > 0
            if m.dtype == jnp.bool_
            else jax.lax.pmean(m, axis),
            new_filters,
        )
        return grads, total, parts, new_filters

    view_spec = P(axis)
    rep = P()

    def tree_specs(tree, n_views):
        # A leaf is view-sharded iff its leading dim IS the view-batch size
        # (not merely divisible by the device count — a replicated (n,...)
        # table would otherwise be silently split, ADVICE r2).
        return jax.tree_util.tree_map(
            lambda x: view_spec
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_views
            else rep,
            tree,
        )

    @jax.jit
    def step(state, cameras, lights, img, mask_img, depth_img=None,
             mask_plain=None):
        # With settings.tiled_io, img/mask_img are the PRE-TILED targets
        # (leading dim still the view batch → same sharding spec) and
        # mask_plain is the untiled mask for the in-mask sampling.
        # depth_img (view-batched dense depth, flagship lambda_depth > 0)
        # shards on the view axis like img.
        n_views = img.shape[0]
        # lights-is-None is static per trace; build matching arg/spec lists.
        args = [state.params, state.filters, cameras]
        specs = [rep, rep, tree_specs(cameras, n_views)]
        if lights is not None:
            args.append(lights)
            specs.append(tree_specs(lights, n_views))
        has_depth = depth_img is not None
        has_plain = mask_plain is not None
        tail_args = [img, mask_img, state.step]
        tail_specs = [view_spec, view_spec, rep]
        if has_depth:
            tail_args.append(depth_img)
            tail_specs.append(view_spec)
        if has_plain:
            tail_args.append(mask_plain)
            tail_specs.append(view_spec)

        def local(params, filters, cams, *rest):
            if lights is not None:
                lt, *rest = rest
            else:
                lt = None
            img_, mask_, it, *rest = rest
            depth_ = rest.pop(0) if has_depth else None
            plain_ = rest.pop(0) if has_plain else None
            return local_grad(params, filters, cams, lt, img_, mask_, it,
                              depth_img=depth_, mask_plain=plain_)

        sharded = shard_map(
            local,
            mesh=mesh,
            in_specs=tuple(specs) + tuple(tail_specs),
            out_specs=(rep, rep, rep, rep),
        )
        grads, total, parts, new_filters = sharded(*args, *tail_args)
        return apply_update(
            optimizer, state, grads, total, parts, new_filters
        )

    return step


def render_view_row_sharded(
    points, normals, colors, mask, camera, lights, settings, mesh: Mesh,
    axis: str = "views",
):
    """Single-view render with the IMAGE ROWS sharded over the mesh — the
    workload's "sequence parallelism" analogue (SURVEY §5): one huge view is
    split across chips instead of the view batch.  Points are replicated
    (they are tiny); each device rasterizes its row slab; GSPMD partitions
    the row-chunked reference rasterizer along the pixel axis.
    """
    from dss_tpu.render.renderer import render_single_view

    n_dev = mesh.shape[axis]
    assert settings.image_size % n_dev == 0

    def run(pts, nrm, col, msk):
        rgba, frags, visible = render_single_view(
            pts, nrm, col, msk, camera, lights,
            settings.replace(backend="reference"),
            row_chunk=settings.image_size // n_dev,
        )
        rgba = jax.lax.with_sharding_constraint(
            rgba, NamedSharding(mesh, P(axis, None, None))
        )
        return rgba, visible

    jitted = jax.jit(
        run,
        in_shardings=(NamedSharding(mesh, P()),) * 4,
        out_shardings=(NamedSharding(mesh, P(axis, None, None)), NamedSharding(mesh, P())),
    )
    return jitted(points, normals, colors, mask)
