"""Causal 3D VAE parity tests vs reference goldens (tests/goldens/vae.npz)."""

import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import VAEConfig
from videopainter_tpu.convert import convert_vae_state_dict
from videopainter_tpu.models import AutoencoderKLCogVideoX

TINY = VAEConfig.tiny()
TOL = dict(rtol=3e-4, atol=3e-5)


def extract_sd(g, name):
    pre = f"sd::{name}::"
    return {k[len(pre):]: g[k] for k in g.files if k.startswith(pre)}


def to_ndhwc(x):  # torch [B,C,T,H,W] -> [B,T,H,W,C]
    return np.transpose(x, (0, 2, 3, 4, 1))


def from_ndhwc(x):
    return np.transpose(np.asarray(x), (0, 4, 1, 2, 3))


@pytest.fixture(scope="module")
def env(goldens):
    g = goldens("vae")
    params = convert_vae_state_dict(extract_sd(g, "vae"))
    vae = AutoencoderKLCogVideoX(TINY)
    return g, vae, params


def test_encode_frame_batched(env):
    g, vae, params = env
    x = jnp.asarray(to_ndhwc(g["io::enc::x"]))
    dist = vae.encode(params, x)
    moments = jnp.concatenate([dist.mean, dist.logvar], axis=-1)
    np.testing.assert_allclose(from_ndhwc(moments), g["io::enc::moments"], **TOL)


def test_encode_single_frame(env):
    g, vae, params = env
    x = jnp.asarray(to_ndhwc(g["io::enc1::x"]))
    dist = vae.encode(params, x)
    moments = jnp.concatenate([dist.mean, dist.logvar], axis=-1)
    np.testing.assert_allclose(from_ndhwc(moments), g["io::enc1::moments"], **TOL)


def test_decode_frame_batched(env):
    g, vae, params = env
    z = jnp.asarray(to_ndhwc(g["io::dec::z"]))
    y = vae.decode(params, z)
    np.testing.assert_allclose(from_ndhwc(y), g["io::dec::y"], **TOL)


def test_decode_single_latent_frame(env):
    g, vae, params = env
    z = jnp.asarray(to_ndhwc(g["io::dec1::z"]))
    y = vae.decode(params, z)
    np.testing.assert_allclose(from_ndhwc(y), g["io::dec1::y"], **TOL)


def test_tiled_encode(env):
    g, vae, params = env
    vae2 = AutoencoderKLCogVideoX(TINY)
    vae2.enable_tiling(tile_sample_min_height=32, tile_sample_min_width=48)
    x = jnp.asarray(to_ndhwc(g["io::tenc::x"]))
    h = jnp.concatenate(vae2.encode(params, x), axis=-1)
    np.testing.assert_allclose(from_ndhwc(h), g["io::tenc::moments"], **TOL)


def test_tiled_decode(env):
    g, vae, params = env
    vae2 = AutoencoderKLCogVideoX(TINY)
    vae2.enable_tiling(tile_sample_min_height=32, tile_sample_min_width=48)
    z = jnp.asarray(to_ndhwc(g["io::tdec::z"]))
    y = vae2.decode(params, z)
    np.testing.assert_allclose(from_ndhwc(y), g["io::tdec::y"], **TOL)


def test_roundtrip_shapes():
    """Temporal contract: T=4k+1 pixel frames -> k+1 latent frames -> 4k+1 decoded."""
    import jax

    vae = AutoencoderKLCogVideoX(TINY)
    params = vae.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 17, 64, 96, 3)) * 0.2
    dist = vae.encode(params, x)
    assert dist.mean.shape == (1, 5, 8, 12, 4)
    y = vae.decode(params, dist.mode())
    assert y.shape == (1, 17, 64, 96, 3)
    assert bool(jnp.isfinite(y).all())


def test_decode_fbs1_frame_count():
    """num_latent_frames_batch_size=1 (single-chip low-memory decode): later
    chunks arrive at the upsampler with t==1 and must still be time-doubled —
    the first-frame special case applies only to the stream's first chunk.
    Regression: this used to yield T' frames instead of 4(T'-1)+1."""
    import jax

    vae = AutoencoderKLCogVideoX(TINY)
    params = vae.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8, 12, 4)) * 0.5

    vae.num_latent_frames_batch_size = 1
    y1 = vae.decode(params, z)
    assert y1.shape == (1, 17, 64, 96, 3)
    assert bool(jnp.isfinite(y1).all())

    # fbs only changes group-norm statistic windows (stats span T), so the
    # chunked stream must stay close to the default fbs=2 decode.
    vae.num_latent_frames_batch_size = 2
    y2 = vae.decode(params, z)
    assert np.corrcoef(np.asarray(y1).ravel(), np.asarray(y2).ravel())[0, 1] > 0.9
