"""Pix2pix ResNet generator (flax) for learned render denoising.

Reference: DSS/misc/pix2pix/** vendors the junyanz pix2pix test path and
DSS/misc/imageFilters.py:184-229 (`Pix2PixDenoising`) loads a pretrained
`resnet_9blocks` generator to denoise rendered images (the paper's learned
image filter).  The pretrained weights are fetched by download_data.sh and
are not redistributable here, so this module provides:

  - `ResnetGenerator`: the same resnet_9blocks architecture in flax
    (reflection-pad convs, instance norm, 2× down/upsample, 9 residual
    blocks, tanh output) — trainable in-framework;
  - `load_torch_generator_weights`: converts a torch `.pth` state_dict of the
    original network into the flax param tree when a user supplies one.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _reflect_pad(x, pad):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class InstanceNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class ResnetBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = _reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv1")(h)
        h = nn.relu(InstanceNorm()(h))
        h = _reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv2")(h)
        h = InstanceNorm()(h)
        return x + h


class ResnetGenerator(nn.Module):
    """resnet_9blocks generator: c7s1-64, d128, d256, 9×R256, u128, u64,
    c7s1-3, tanh."""

    out_channels: int = 3
    ngf: int = 64
    n_blocks: int = 9

    @nn.compact
    def __call__(self, x):  # (N, H, W, C) in [-1, 1]
        h = _reflect_pad(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", name="in_conv")(h)
        h = nn.relu(InstanceNorm()(h))
        for i, mult in enumerate((2, 4)):
            h = nn.Conv(
                self.ngf * mult, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                name=f"down{i}",
            )(h)
            h = nn.relu(InstanceNorm()(h))
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, name=f"res{i}")(h)
        for i, mult in enumerate((2, 1)):
            h = nn.ConvTranspose(
                self.ngf * mult, (3, 3), strides=(2, 2), padding="SAME",
                name=f"up{i}",
            )(h)
            h = nn.relu(InstanceNorm()(h))
        h = _reflect_pad(h, 3)
        h = nn.Conv(self.out_channels, (7, 7), padding="VALID", name="out_conv")(h)
        return jnp.tanh(h)


def denoise_images(apply_fn, params, images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] images (N, H, W, 3) → denoised [0,1] (reference
    Pix2PixDenoising.forward semantics: normalize to [-1,1], net, back)."""
    x = images * 2.0 - 1.0
    y = apply_fn(params, x)
    return jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)


def load_torch_generator_weights(pth_path: str, flax_params) -> Any:
    """Best-effort conversion of the original torch generator state_dict into
    the flax param tree (matching by layer order: conv kernels transposed
    OIHW→HWIO).  Returns the updated params; raises on incompatible shapes."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    torch_convs = [
        (k, v) for k, v in sd.items() if k.endswith("weight") and v.dim() == 4
    ]
    torch_biases = {k[: -len("weight")] + "bias": sd.get(k[: -len("weight")] + "bias")
                    for k, _ in torch_convs}

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    kernels = [(path, leaf) for path, leaf in flat
               if str(path[-1].key if hasattr(path[-1], "key") else path[-1]) == "kernel"]
    if len(kernels) != len(torch_convs):
        raise ValueError(
            f"layer count mismatch: torch {len(torch_convs)} vs flax {len(kernels)}"
        )
    new = dict(jax.tree_util.tree_flatten_with_path(flax_params)[0])
    updates = {}
    for (path, leaf), (tk, tv) in zip(kernels, torch_convs):
        w = np.asarray(tv.numpy())
        w = np.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO
        if w.shape != leaf.shape:
            raise ValueError(f"{tk}: shape {w.shape} vs {leaf.shape}")
        updates[path] = jnp.asarray(w)
        bkey = tk[: -len("weight")] + "bias"
        if torch_biases.get(bkey) is not None:
            bias_path = path[:-1] + (jax.tree_util.DictKey("bias"),)
            updates[bias_path] = jnp.asarray(torch_biases[bkey].numpy())

    def rebuild(tree):
        flat2, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = [updates.get(pth, leaf) for pth, leaf in flat2]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return rebuild(flax_params)
