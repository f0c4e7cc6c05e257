"""Neural decoders (flax.linen): Siren, DeepSDF/SAL-style SDF, rendering MLP,
ONet-style Occupancy decoder, ResidualSDF, positional encoding, central-
difference gradients.

Reference: DSS/models/common.py — Siren (92-167), Embedder/get_embedder
(173-219), SDF (222-312, geometric init + skip connections + softplus β=100),
RenderingNetwork (315-368), ResnetBlockFC (370-413), Occupancy (415-491),
approximate_gradient (494-535), ResidualSDF (538-594).

Outputs follow the reference's out_dims convention: a dict like
{"sdf": 1, "rgb": 3}; decoders return {"sdf": (..., 1), "rgb": (..., 3)} with
rgb squashed (sigmoid, or tanh-scaled for RenderingNetwork).

Deviation: the reference wraps linears in torch weight_norm for SDF /
RenderingNetwork; here `WNDense` implements the same w = g·v/‖v‖
parameterization explicitly.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def positional_encoding(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """NeRF positional encoding, log-sampled frequencies 2^0..2^(n-1)
    (reference Embedder, common.py:173-219)."""
    if num_freqs <= 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # (..., F, D)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    enc = enc.reshape(x.shape[:-1] + (2 * num_freqs * x.shape[-1],))
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def embedding_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dim * (2 * num_freqs + (1 if include_input else 0))


def _split_outputs(x: jnp.ndarray, out_dims: Dict[str, int]) -> Dict[str, jnp.ndarray]:
    out = {}
    ofs = 0
    for k, d in out_dims.items():
        out[k] = x[..., ofs : ofs + d]
        ofs += d
    return out


class SineLayer(nn.Module):
    """Siren sine layer with omega_0 scaling and the Sitzmann init."""

    features: int
    is_first: bool = False
    omega_0: float = 30.0

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        if self.is_first:
            init = nn.initializers.uniform(scale=2.0 / in_dim)  # U(-1/d, 1/d)

            def first_init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -1.0 / in_dim, 1.0 / in_dim)

            kernel_init = first_init
        else:
            bound = math.sqrt(6.0 / in_dim) / self.omega_0

            def hidden_init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            kernel_init = hidden_init
        x = nn.Dense(self.features, kernel_init=kernel_init)(x)
        return jnp.sin(self.omega_0 * x)


class Siren(nn.Module):
    """Sine MLP (reference common.py:92-167)."""

    hidden_size: int = 256
    n_layers: int = 3
    out_dims: Tuple[Tuple[str, int], ...] = (("sdf", 1),)
    outermost_linear: bool = True
    first_omega_0: float = 30.0
    hidden_omega_0: float = 30.0

    @nn.compact
    def __call__(self, coords, c: Optional[jnp.ndarray] = None):
        out_dims = dict(self.out_dims)
        out_dim = sum(out_dims.values())
        x = coords if c is None else jnp.concatenate([c, coords], axis=-1)
        x = SineLayer(self.hidden_size, is_first=True, omega_0=self.first_omega_0)(x)
        for _ in range(self.n_layers):
            x = SineLayer(self.hidden_size, omega_0=self.hidden_omega_0)(x)
        if self.outermost_linear:
            bound = math.sqrt(6.0 / self.hidden_size) / self.hidden_omega_0

            def final_init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            x = nn.Dense(out_dim, kernel_init=final_init)(x)
        else:
            x = SineLayer(out_dim, omega_0=self.hidden_omega_0)(x)
        res = _split_outputs(x, out_dims)
        if "rgb" in res:
            res["rgb"] = jax.nn.sigmoid(res["rgb"])
        return res


class WNDense(nn.Module):
    """Weight-normalized Dense: w = g · v/‖v‖ (column-wise, torch
    weight_norm semantics)."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        v = self.param("v", self.kernel_init, (x.shape[-1], self.features))
        # g initialized from THIS v's column norms → w == v at init (torch
        # weight_norm semantics), preserving the geometric initialization.
        g = self.param(
            "g", lambda k, s: jnp.linalg.norm(v, axis=0) + 1e-12, (self.features,)
        )
        b = self.param("bias", self.bias_init, (self.features,))
        w = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12) * g
        return x @ w + b


class SDF(nn.Module):
    """DeepSDF/SAL-style SDF MLP with geometric initialization, positional
    encoding, and skip connections (reference common.py:222-312)."""

    out_dims: Tuple[Tuple[str, int], ...] = (("sdf", 1),)
    hidden_size: int = 512
    n_layers: int = 8
    bias: float = 0.6
    skip_in: Tuple[int, ...] = (4,)
    num_frequencies: int = 6

    @nn.compact
    def __call__(self, x, c: Optional[jnp.ndarray] = None):
        out_dims = dict(self.out_dims)
        out_total = sum(out_dims.values())
        inp = positional_encoding(x, self.num_frequencies)
        d_in = inp.shape[-1]
        dims = [d_in] + [self.hidden_size] * self.n_layers + [out_total]
        n_layers = len(dims)

        # skip connections only into hidden layers (a skip index past the
        # last hidden layer would make the width negative)
        skip_in = tuple(s for s in self.skip_in if 0 < s <= self.n_layers)

        h = inp
        if c is not None:
            h = jnp.concatenate([c, h], axis=-1)
        for l in range(n_layers - 1):
            out_d = dims[l + 1] - (d_in if (l + 1) in skip_in else 0)
            if l == n_layers - 2:
                # geometric init: mean sqrt(pi)/sqrt(d), bias −b → sphere SDF
                def k_init(key, shape, dtype=jnp.float32, _d=dims[l]):
                    return (
                        jax.random.normal(key, shape, dtype) * 1e-4
                        + math.sqrt(math.pi) / math.sqrt(_d)
                    )

                def b_init(key, shape, dtype=jnp.float32):
                    return jnp.full(shape, -self.bias, dtype)

                lin = WNDense(out_d, kernel_init=k_init, bias_init=b_init)
            elif self.num_frequencies > 0 and l == 0:
                def k_init0(key, shape, dtype=jnp.float32, _o=out_d):
                    w = jnp.zeros(shape, dtype)
                    w = w.at[:3, :].set(
                        jax.random.normal(key, (3, shape[1]), dtype)
                        * math.sqrt(2.0) / math.sqrt(_o)
                    )
                    return w

                lin = WNDense(out_d, kernel_init=k_init0)
            else:
                def k_initn(key, shape, dtype=jnp.float32, _o=out_d, _l=l):
                    w = jax.random.normal(key, shape, dtype) * (
                        math.sqrt(2.0) / math.sqrt(_o)
                    )
                    if self.num_frequencies > 0 and _l in skip_in:
                        w = w.at[-(d_in - 3):, :].set(0.0)
                    return w

                lin = WNDense(out_d, kernel_init=k_initn)
            if l in skip_in:
                h = jnp.concatenate([h, inp], axis=-1) / math.sqrt(2.0)
            h = lin(h)
            if l < n_layers - 2:
                h = jax.nn.softplus(100.0 * h) / 100.0  # softplus(beta=100)
        res = _split_outputs(h, out_dims)
        if "rgb" in res:
            res["rgb"] = jax.nn.sigmoid(res["rgb"])
        return res


class RenderingNetwork(nn.Module):
    """View-dependent shading MLP (reference common.py:315-368): inputs are
    (normals, points, encoded view dirs [+ code]); tanh output scaled to
    [0, 1]."""

    out_dims: Tuple[Tuple[str, int], ...] = (("rgb", 3),)
    hidden_size: int = 512
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, c: Optional[jnp.ndarray] = None):
        out_dims = dict(self.out_dims)
        out_total = sum(out_dims.values())
        h = x if c is None else jnp.concatenate([c, x], axis=-1)
        for _ in range(self.n_layers):
            h = nn.relu(WNDense(self.hidden_size)(h))
        h = jnp.tanh(WNDense(out_total)(h))
        res = _split_outputs(h, out_dims)
        if "rgb" in res:
            res["rgb"] = res["rgb"] / 2.0 + 0.5  # scale_rgb
        return res


class ResnetBlockFC(nn.Module):
    """ONet fully-connected ResNet block (reference common.py:370-413)."""

    size_out: Optional[int] = None
    size_h: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        net = nn.Dense(size_h)(nn.relu(x))
        dx = nn.Dense(size_out, kernel_init=nn.initializers.zeros)(nn.relu(net))
        if size_in == size_out:
            xs = x
        else:
            xs = nn.Dense(size_out, use_bias=False)(x)
        return xs + dx


class Occupancy(nn.Module):
    """ONet-style decoder: 5 FC-ResNet blocks with optional conditioning
    added per block (reference common.py:415-491)."""

    out_dims: Tuple[Tuple[str, int], ...] = (("occupancy", 1), ("rgb", 3))
    hidden_size: int = 512
    n_blocks: int = 5
    leaky: bool = False

    @nn.compact
    def __call__(self, p, c: Optional[jnp.ndarray] = None):
        out_dims = dict(self.out_dims)
        out_total = sum(out_dims.values())
        act = (lambda v: nn.leaky_relu(v, 0.2)) if self.leaky else nn.relu
        net = nn.Dense(self.hidden_size)(p)
        for _ in range(self.n_blocks):
            if c is not None:
                net = net + nn.Dense(self.hidden_size)(c)
            net = ResnetBlockFC()(net)
        out = nn.Dense(out_total)(act(net))
        res = _split_outputs(out, out_dims)
        if "rgb" in res:
            res["rgb"] = jax.nn.sigmoid(res["rgb"])
        return res


class ResidualSDF(nn.Module):
    """Base SDF + gated Siren residual (reference common.py:538-594):
    sdf = base + (1+R)/(R + exp(base²/0.01)) · residual, gate detached."""

    out_dims: Tuple[Tuple[str, int], ...] = (("sdf", 1),)
    hidden_size: int = 512
    n_layers: int = 8
    siren_hidden_size: int = 256
    siren_n_layers: int = 3

    @nn.compact
    def __call__(self, x, c=None, only_base: bool = False):
        base = SDF(
            out_dims=self.out_dims,
            hidden_size=self.hidden_size,
            n_layers=self.n_layers,
        )(x, c)
        if only_base:
            return base
        res = Siren(
            hidden_size=self.siren_hidden_size,
            n_layers=self.siren_n_layers,
            out_dims=self.out_dims,
        )(x)
        r = 100.0
        gate = (1.0 + r) / (r + jnp.exp(base["sdf"] ** 2 / 0.01))
        out = dict(base)
        out["sdf"] = base["sdf"] + jax.lax.stop_gradient(gate) * res["sdf"]
        return out


def approximate_gradient(
    points: jnp.ndarray,
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    h: float = 1e-3,
) -> jnp.ndarray:
    """Central-difference SDF gradient (reference common.py:494-535)."""
    eye = jnp.eye(3, dtype=points.dtype) * (h / 2.0)
    plus = points[:, None, :] + eye[None]
    minus = points[:, None, :] - eye[None]
    f = sdf_fn(jnp.concatenate([plus, minus], axis=1).reshape(-1, 3)).reshape(
        points.shape[0], 6
    )
    return (f[:, :3] - f[:, 3:]) / h


def neural_texture_features(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    camera_position: Optional[jnp.ndarray] = None,
    view_freqs: int = 4,
) -> jnp.ndarray:
    """Input assembly for a NeuralTexture decoder: (normals, points
    [, encoded view dirs]) (reference DSS/core/texture.py:130-162)."""
    feats = [normals, points]
    if camera_position is not None:
        vd = points - camera_position[None, :]
        vd = vd / jnp.maximum(jnp.linalg.norm(vd, axis=-1, keepdims=True), 1e-12)
        feats.append(positional_encoding(vd, view_freqs))
    return jnp.concatenate(feats, axis=-1)
