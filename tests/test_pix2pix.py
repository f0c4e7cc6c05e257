"""pix2pix denoiser parity: the flax ResnetGenerator + torch-weight converter
must reproduce the reference's own generator (DSS/misc/pix2pix/models/
networks.py) bit-for-bit on the same weights — the reference's pretrained
checkpoints (download_data.sh) then load directly.

The reference module is imported from /root/reference and RUN (like the
rasterizer goldens); tests skip when torch or the reference tree is absent.
"""
import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_NETWORKS = "/root/reference/DSS/misc/pix2pix/models/networks.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_NETWORKS), reason="reference tree not available"
)


def _load_ref_networks():
    spec = importlib.util.spec_from_file_location("ref_networks", REF_NETWORKS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("norm", ["pixel", "instance"])
def test_generator_matches_reference(norm):
    import jax
    import jax.numpy as jnp

    from dss_tpu.models.pix2pix import (
        ResnetGenerator,
        load_torch_generator_weights,
    )

    ref = _load_ref_networks()
    torch.manual_seed(0)
    net = ref.ResnetGenerator(
        3, 3, ngf=16, norm_layer=ref.get_norm_layer(norm), use_dropout=False,
        n_blocks=9,
    )
    net.eval()

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = net(x).numpy().transpose(0, 2, 3, 1)  # NCHW → NHWC

    model = ResnetGenerator(out_channels=3, ngf=16, n_blocks=9, norm=norm)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = model.init(jax.random.PRNGKey(0), xj)
    params = load_torch_generator_weights(net.state_dict(), params)
    got = np.asarray(model.apply(params, xj))

    np.testing.assert_allclose(got, want, atol=2e-5)


def test_converter_roundtrip_via_pth(tmp_path):
    """Loading from a .pth file (the checkpoint form the reference ships)."""
    import jax
    import jax.numpy as jnp

    from dss_tpu.models.pix2pix import (
        ResnetGenerator,
        load_torch_generator_weights,
    )

    ref = _load_ref_networks()
    torch.manual_seed(1)
    net = ref.ResnetGenerator(
        3, 3, ngf=8, norm_layer=ref.get_norm_layer("pixel"), n_blocks=2
    )
    net.eval()
    pth = tmp_path / "gen.pth"
    torch.save(net.state_dict(), str(pth))

    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        want = net(x).numpy().transpose(0, 2, 3, 1)

    model = ResnetGenerator(out_channels=3, ngf=8, n_blocks=2, norm="pixel")
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = model.init(jax.random.PRNGKey(0), xj)
    params = load_torch_generator_weights(str(pth), params)
    got = np.asarray(model.apply(params, xj))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_denoise_images_semantics():
    """imageFilters.py:210-229: shift -0.5, net, clamp to input per-channel
    min/max, shift back — checked against a direct numpy transcription."""
    import jax.numpy as jnp

    from dss_tpu.models.pix2pix import denoise_images

    rng = np.random.default_rng(3)
    imgs = rng.random((2, 8, 8, 3)).astype(np.float32)
    fake = (rng.random((2, 8, 8, 3)).astype(np.float32) - 0.5) * 3.0

    apply_fn = lambda params, x: jnp.asarray(fake)
    got = np.asarray(denoise_images(apply_fn, None, jnp.asarray(imgs)))

    x = imgs - 0.5
    lo = x.min(axis=(1, 2), keepdims=True)
    hi = x.max(axis=(1, 2), keepdims=True)
    want = np.clip(fake, lo, hi) + 0.5
    np.testing.assert_allclose(got, want, atol=1e-6)
