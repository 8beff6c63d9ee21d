"""Visual-RL stack: pixel env rendering, augmentations, encoder shapes,
SAC-AE/RAD/CURL train steps (reference sac_ae.py + aug buffers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilswiss_tpu.algorithms.sac_ae import SACAE, SACAEConfig
from ilswiss_tpu.data.aug_replay import augmented_sample
from ilswiss_tpu.data.augmentations import (
    center_crop, grayscale, random_crop, random_cutout, random_translate,
)
from ilswiss_tpu.data.replay import replay_add, replay_init, replay_sample
from ilswiss_tpu.envs import make, make_vec
from ilswiss_tpu.envs.vector import Transition
from ilswiss_tpu.models.encoders import (
    PixelDecoder, PixelEncoder, conv_out_dim,
)


def test_pixel_pendulum_renders():
    env = make("pendulum_pixels")
    st = env.reset(jax.random.PRNGKey(0))
    assert st.obs.shape == (64, 64, 3)
    img = np.asarray(st.obs)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert img.max() > 0.5  # rod is visible
    # stepping changes the newest frame only at start (stack rolls)
    out = env.step(st, jnp.array([2.0]))
    assert not np.allclose(np.asarray(out.obs[..., 2]), img[..., 2])


def test_pixel_pendulum_vec():
    vec = make_vec("pendulum_pixels", num_envs=3)
    st = vec.reset(jax.random.PRNGKey(0))
    assert st.obs.shape == (3, 64, 64, 3)
    st2, tr = jax.jit(vec.step)(st, jnp.zeros((3, 1)))
    assert tr.next_obs.shape == (3, 64, 64, 3)


def test_augmentations_shapes():
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (4, 72, 72, 3))
    assert random_crop(key, imgs, 64).shape == (4, 64, 64, 3)
    assert center_crop(imgs, 64).shape == (4, 64, 64, 3)
    assert random_translate(key, imgs, 80).shape == (4, 80, 80, 3)
    cut = random_cutout(key, imgs)
    assert cut.shape == imgs.shape
    assert float(jnp.sum(cut == 0)) > 0
    g = grayscale(key, imgs, p=1.0)
    np.testing.assert_allclose(g[..., 0], g[..., 1], rtol=1e-5)


def test_encoder_decoder_shapes():
    enc = PixelEncoder(feature_dim=50, num_layers=4)
    img = jnp.zeros((2, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), img)
    z = enc.apply(params, img)
    assert z.shape == (2, 50)
    assert float(jnp.max(jnp.abs(z))) <= 1.0  # tanh head

    out_hw = conv_out_dim(64, 4)
    dec = PixelDecoder(out_hw=out_hw, channels=3, num_layers=4,
                       out_size=64)
    dparams = dec.init(jax.random.PRNGKey(1), z)
    rec = dec.apply(dparams, z)
    assert rec.shape == (2, 64, 64, 3)


def _image_batch(n=8, size=64):
    key = jax.random.PRNGKey(0)
    return {
        "obs": jax.random.uniform(key, (n, size, size, 3)),
        "action": jax.random.uniform(key, (n, 1), minval=-1, maxval=1),
        "reward": jnp.zeros((n,)),
        "terminal": jnp.zeros((n,)),
        "next_obs": jax.random.uniform(key, (n, size, size, 3)),
    }


def test_sac_ae_train_step():
    sacae = SACAE(action_size=1, config=SACAEConfig(
        image_size=64, feature_dim=16, num_conv_layers=2, num_filters=8,
    ), net_size=32, num_hidden_layers=1)
    state = sacae.init(jax.random.PRNGKey(0))
    batch = _image_batch()
    step = jax.jit(sacae.train_step)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    for k in ("qf1_loss", "policy_loss", "rec_loss", "alpha"):
        assert np.isfinite(float(metrics[k])), k
    assert int(state.step) == 3


def test_sac_ae_curl_step():
    sacae = SACAE(action_size=1, config=SACAEConfig(
        image_size=64, feature_dim=16, num_conv_layers=2, num_filters=8,
        cpc_update_freq=1, encdec_update_freq=0,
    ), net_size=32, num_hidden_layers=1)
    state = sacae.init(jax.random.PRNGKey(0))
    batch = _image_batch()
    batch["observations_anchor"] = batch["obs"]
    batch["observations_pos"] = batch["next_obs"]
    state, metrics = jax.jit(sacae.train_step)(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["curl_loss"]))


def test_image_replay_and_augmented_sample():
    st = replay_init(capacity=32, obs_size=(72, 72, 3), action_size=1,
                     write_batch=4)
    tr = Transition(
        obs=jnp.ones((4, 72, 72, 3)) * 0.5,
        action=jnp.zeros((4, 1)),
        reward=jnp.zeros((4,)),
        next_obs=jnp.ones((4, 72, 72, 3)) * 0.5,
        terminal=jnp.zeros((4,), bool),
        done=jnp.zeros((4,), bool),
    )
    st = replay_add(st, tr)
    batch = augmented_sample(st, jax.random.PRNGKey(0), 8,
                             augs=("crop",), out_size=64, cpc=True)
    assert batch["obs"].shape == (8, 64, 64, 3)
    assert batch["observations_anchor"].shape == (8, 64, 64, 3)
    assert batch["observations_pos"].shape == (8, 64, 64, 3)


def test_encoder_policy_separation():
    """Policy updates must not touch the encoder (sac_ae.py:262-268)."""
    sacae = SACAE(action_size=1, config=SACAEConfig(
        image_size=64, feature_dim=16, num_conv_layers=2, num_filters=8,
        encdec_update_freq=0, ac_update_freq=1, target_update_freq=1000,
    ), net_size=16, num_hidden_layers=1)
    state = sacae.init(jax.random.PRNGKey(0))
    batch = _image_batch()
    new_state, _ = sacae._train_ac(state, batch, jax.random.PRNGKey(1))
    # encoder changed via the critic loss...
    enc_before = jax.tree.leaves(state.encoder_params)[0]
    enc_after = jax.tree.leaves(new_state.encoder_params)[0]
    assert not np.allclose(enc_before, enc_after)
    # ...and policy changed without feeding gradients back through it:
    # (structural check: policy_loss_fn consumed stop_grad features; if
    # that broke, the joint update above would differ — sanity only)
    p_before = jax.tree.leaves(state.policy_params)[0]
    p_after = jax.tree.leaves(new_state.policy_params)[0]
    assert not np.allclose(p_before, p_after)


def test_color_jitter_pixels():
    """Pixel-level checks for the RAD color jitter
    (reference transform_layer.py ColorJitterLayer):
    HSV round-trip vs colorsys, p=0 identity, jitter changes pixels
    while staying in range and preserving the stack layout."""
    import colorsys

    from ilswiss_tpu.data.augmentations import (
        _hsv2rgb, _rgb2hsv, color_jitter,
    )

    rng = np.random.RandomState(0)
    px = rng.uniform(0.05, 0.95, (32, 3)).astype(np.float32)
    hsv = np.asarray(_rgb2hsv(jnp.asarray(px)))
    expect = np.array([colorsys.rgb_to_hsv(*p) for p in px])
    np.testing.assert_allclose(hsv, expect, atol=1e-4)
    # round trip
    back = np.asarray(_hsv2rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, px, atol=1e-4)

    imgs = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 9)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    out = color_jitter(key, imgs, p=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-6)
    out = color_jitter(key, imgs, p=1.0)
    assert out.shape == imgs.shape
    o = np.asarray(out)
    assert 0.0 <= o.min() and o.max() <= 1.0
    assert np.abs(o - np.asarray(imgs)).max() > 0.01
    # identity factors -> identity transform
    out_id = color_jitter(key, imgs, brightness=0.0, contrast=0.0,
                          saturation=0.0, hue=0.0, p=1.0)
    np.testing.assert_allclose(np.asarray(out_id), np.asarray(imgs),
                               atol=1e-3)
