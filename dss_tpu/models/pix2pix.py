"""Pix2pix ResNet generator (flax) for learned render denoising.

Reference: DSS/misc/pix2pix/** vendors the junyanz pix2pix test path and
DSS/misc/imageFilters.py:184-229 (`Pix2PixDenoising`) loads a pretrained
generator to denoise rendered images (the paper's learned image filter).
The deployed configuration (imageFilters.py:202-204) is `norm='pixel'` +
`netG='resnet_9blocks'`: reflection-pad convs, PIXEL norm
(networks.py:8-14: x / sqrt(mean_c(x²) + 1e-8)), bias-free convs everywhere
except the final output conv (networks.py:343-345 sets use_bias only for
InstanceNorm2d; networks.py:374 gives the out conv its default bias), 2×
down/upsample, 9 residual blocks, tanh.

The pretrained weights are fetched by the reference's download_data.sh and
are not redistributable here, so this module provides:

  - `ResnetGenerator`: the same architecture in flax — trainable
    in-framework, or loadable from the original torch checkpoints;
  - `load_torch_generator_weights`: exact conversion of a torch state_dict
    of the original network into the flax param tree (parity-tested against
    the reference's own networks.py in tests/test_pix2pix.py);
  - `denoise_images`: the Pix2PixDenoising.forward semantics
    (imageFilters.py:210-229: shift by -0.5, run the net, clamp to the
    input's per-image/per-channel min/max, shift back).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _reflect_pad(x, pad):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class PixelNorm(nn.Module):
    """networks.py:8-14 PixelNormLayer: normalize across channels per pixel."""

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-8)


class InstanceNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


def _make_norm(norm: str):
    if norm == "pixel":
        return PixelNorm
    if norm == "instance":
        return InstanceNorm
    raise ValueError(f"unsupported norm: {norm}")


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "pixel"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        norm = _make_norm(self.norm)
        h = _reflect_pad(x, 1)
        h = nn.Conv(
            self.dim, (3, 3), padding="VALID", use_bias=self.use_bias,
            name="conv1",
        )(h)
        h = nn.relu(norm()(h))
        h = _reflect_pad(h, 1)
        h = nn.Conv(
            self.dim, (3, 3), padding="VALID", use_bias=self.use_bias,
            name="conv2",
        )(h)
        h = norm()(h)
        return x + h


class ResnetGenerator(nn.Module):
    """resnet_9blocks generator: c7s1-64, d128, d256, 9×R256, u128, u64,
    c7s1-3, tanh (networks.py:322-381).  `norm='pixel'` is the reference's
    deployed denoiser config; biases follow networks.py:343-345 (none except
    the final conv)."""

    out_channels: int = 3
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "pixel"

    @nn.compact
    def __call__(self, x):  # (N, H, W, C), input already shifted/normalized
        norm = _make_norm(self.norm)
        use_bias = self.norm == "instance"
        h = _reflect_pad(x, 3)
        h = nn.Conv(
            self.ngf, (7, 7), padding="VALID", use_bias=use_bias,
            name="in_conv",
        )(h)
        h = nn.relu(norm()(h))
        for i, mult in enumerate((2, 4)):
            h = nn.Conv(
                self.ngf * mult, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), use_bias=use_bias, name=f"down{i}",
            )(h)
            h = nn.relu(norm()(h))
        for i in range(self.n_blocks):
            h = ResnetBlock(
                self.ngf * 4, norm=self.norm, use_bias=use_bias,
                name=f"res{i}",
            )(h)
        for i, mult in enumerate((2, 1)):
            # torch ConvTranspose2d(k=3, s=2, padding=1, output_padding=1)
            # ≡ lax.conv_transpose with asymmetric padding ((1,2),(1,2)) on a
            # spatially flipped kernel (the converter flips).
            h = nn.ConvTranspose(
                self.ngf * mult, (3, 3), strides=(2, 2),
                padding=((1, 2), (1, 2)), use_bias=use_bias, name=f"up{i}",
            )(h)
            h = nn.relu(norm()(h))
        h = _reflect_pad(h, 3)
        # final conv keeps its bias in every norm config (networks.py:374)
        h = nn.Conv(
            self.out_channels, (7, 7), padding="VALID", use_bias=True,
            name="out_conv",
        )(h)
        return jnp.tanh(h)


def denoise_images(apply_fn, params, images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] images (N, H, W, 3) → denoised [0,1].

    Reference Pix2PixDenoising.forward (imageFilters.py:210-229): shift to
    [-0.5, 0.5], run the generator, clamp the output to the shifted input's
    per-image/per-channel min/max, shift back."""
    x = images - 0.5
    y = apply_fn(params, x)
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    return jnp.clip(y, lo, hi) + 0.5


def load_torch_generator_weights(pth_or_state, flax_params) -> Any:
    """Convert a torch state_dict of the reference generator into the flax
    param tree.

    Matching is by layer order (nn.Sequential enumeration == flax module
    order here).  Conv2d weights are OIHW→HWIO; ConvTranspose2d weights are
    (in, out, kh, kw) with a spatial FLIP (torch conv_transpose correlates
    the flipped kernel relative to lax.conv_transpose).  Raises on any
    shape/count mismatch.  Accepts a path or an in-memory state_dict."""
    if isinstance(pth_or_state, (str, bytes)):
        import torch

        sd = torch.load(pth_or_state, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {
            k: (v if isinstance(v, np.ndarray) else v.numpy())
            for k, v in pth_or_state.items()
        }
    # strip DataParallel / wrapper prefixes
    sd = {k.split("module.")[-1]: v for k, v in sd.items()}

    torch_convs = [
        (k, v) for k, v in sd.items() if k.endswith("weight") and v.ndim == 4
    ]

    flat, treedef = jax.tree_util.tree_flatten_with_path(flax_params)

    def _names(path):
        return [str(p.key if hasattr(p, "key") else p) for p in path]

    kernels = [
        (path, leaf)
        for path, leaf in flat
        if _names(path)[-1] == "kernel"
    ]

    # tree_flatten orders dict keys alphabetically; the torch state_dict is in
    # nn.Sequential order.  Re-order the flax kernels to the torch sequence.
    def _seq_key(entry):
        names = _names(entry[0])
        mod = names[-2]  # flax module name owning the kernel
        if mod == "in_conv":
            return (0, 0, 0)
        if mod.startswith("down"):
            return (1, int(mod[4:]), 0)
        if mod in ("conv1", "conv2"):  # inside a res block
            block = next(n for n in names if n.startswith("res"))
            return (2, int(block[3:]), int(mod[-1]))
        if mod.startswith("up"):
            return (3, int(mod[2:]), 0)
        assert mod == "out_conv", mod
        return (4, 0, 0)

    kernels.sort(key=_seq_key)
    if len(kernels) != len(torch_convs):
        raise ValueError(
            f"layer count mismatch: torch {len(torch_convs)} vs flax "
            f"{len(kernels)}"
        )

    updates = {}
    for (path, leaf), (tk, tv) in zip(kernels, torch_convs):
        w = np.asarray(tv)
        # flax module names: "up0"/"up1" are the ConvTranspose layers; shape
        # cannot discriminate (square equal-channel kernels are ambiguous).
        names = [
            str(p.key if hasattr(p, "key") else p) for p in path
        ]
        transposed = any(n.startswith("up") for n in names)
        if transposed:
            # ConvTranspose2d: (in, out, kh, kw) → flip → (kh, kw, in, out)
            w = np.ascontiguousarray(
                w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            )
        else:
            # Conv2d: OIHW → HWIO
            w = np.transpose(w, (2, 3, 1, 0))
        if w.shape != leaf.shape:
            raise ValueError(f"{tk}: converted {w.shape} vs flax {leaf.shape}")
        updates[path] = jnp.asarray(w)
        bkey = tk[: -len("weight")] + "bias"
        if bkey in sd:
            bias_path = path[:-1] + (jax.tree_util.DictKey("bias"),)
            updates[bias_path] = jnp.asarray(np.asarray(sd[bkey]))

    n_bias_updates = sum(
        1 for p in updates if str(p[-1].key) == "bias"
    )
    n_bias_flax = sum(
        1
        for path, _ in flat
        if str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        == "bias"
    )
    if n_bias_updates != n_bias_flax:
        raise ValueError(
            f"bias count mismatch: torch {n_bias_updates} vs flax {n_bias_flax}"
        )

    leaves = [updates.get(path, leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
