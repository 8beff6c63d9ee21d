"""Image augmentations for RAD/CURL, vmapped on device.

Rebuild of the reference augmentation pipeline
(rlkit/data_management/data_augmentation.py, numpy/torch ports of RAD):
random crop / translate / cutout / grayscale as pure batched JAX ops —
per-sample randomness via vmapped dynamic slices instead of host loops.
Registry mirrors the reference's aug-name map (aug_replay_buffer.py:10-22).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def random_crop(key: jax.Array, imgs: jnp.ndarray, out_size: int
                ) -> jnp.ndarray:
    """[B, H, W, C] -> [B, out, out, C], per-image random offsets
    (reference random_crop, data_augmentation.py:43)."""
    b, h, w, c = imgs.shape
    max_off = h - out_size
    keys = jax.random.split(key, b)

    def crop_one(k, img):
        kx, ky = jax.random.split(k)
        ox = jax.random.randint(kx, (), 0, max_off + 1)
        oy = jax.random.randint(ky, (), 0, max_off + 1)
        return jax.lax.dynamic_slice(
            img, (oy, ox, 0), (out_size, out_size, c))

    return jax.vmap(crop_one)(keys, imgs)


def center_crop(imgs: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Deterministic eval-time crop.  When out_size exceeds the source
    (RAD 'translate' mode: 100px frames on a 108px canvas,
    reference exp_specs/sac_rad/*.yaml image_size vs
    pre_transform_image_size) this is a center-translate instead —
    the image pasted centered on a zero canvas, matching RAD's
    eval-time center_translate."""
    h = imgs.shape[1]
    if out_size <= h:
        off = (h - out_size) // 2
        return imgs[:, off:off + out_size, off:off + out_size, :]
    b, _, w, c = imgs.shape
    off = (out_size - h) // 2
    canvas = jnp.zeros((b, out_size, out_size, c), imgs.dtype)
    return jax.lax.dynamic_update_slice(canvas, imgs, (0, off, off, 0))


def random_translate(key: jax.Array, imgs: jnp.ndarray, out_size: int
                     ) -> jnp.ndarray:
    """Place each [H, W] image at a random position on a zero [out, out]
    canvas (reference random_translate)."""
    b, h, w, c = imgs.shape
    pad = out_size - h
    keys = jax.random.split(key, b)

    def translate_one(k, img):
        kx, ky = jax.random.split(k)
        ox = jax.random.randint(kx, (), 0, pad + 1)
        oy = jax.random.randint(ky, (), 0, pad + 1)
        canvas = jnp.zeros((out_size, out_size, c), img.dtype)
        return jax.lax.dynamic_update_slice(canvas, img, (oy, ox, 0))

    return jax.vmap(translate_one)(keys, imgs)


def random_cutout(key: jax.Array, imgs: jnp.ndarray,
                  min_cut: int = 10, max_cut: int = 30) -> jnp.ndarray:
    """Zero a random square patch per image (reference random_cutout)."""
    b, h, w, c = imgs.shape
    keys = jax.random.split(key, b)

    def cut_one(k, img):
        ks, kx, ky = jax.random.split(k, 3)
        size = jax.random.randint(ks, (), min_cut, max_cut)
        ox = jax.random.randint(kx, (), 0, w - max_cut)
        oy = jax.random.randint(ky, (), 0, h - max_cut)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        mask = ((yy >= oy) & (yy < oy + size)
                & (xx >= ox) & (xx < ox + size))
        return jnp.where(mask[..., None], 0, img)

    return jax.vmap(cut_one)(keys, imgs)


def grayscale(key: jax.Array, imgs: jnp.ndarray, p: float = 0.3
              ) -> jnp.ndarray:
    """Random per-image grayscale conversion (reference grayscale :61);
    channels are frame-stacked RGB triples in the visual pipeline, so a
    plain channel-mean is used here."""
    b = imgs.shape[0]
    gray = jnp.mean(imgs.astype(jnp.float32), axis=-1, keepdims=True)
    gray = jnp.broadcast_to(gray, imgs.shape).astype(imgs.dtype)
    flip = jax.random.uniform(key, (b, 1, 1, 1)) < p
    return jnp.where(flip, gray, imgs)


def no_aug(key: jax.Array, imgs: jnp.ndarray) -> jnp.ndarray:
    return imgs


# --- color jitter (reference ColorJitterLayer,
# rlkit/torch/utils/transform_layer.py + random_color_jitter in
# data_augmentation.py:280-293: brightness/contrast/saturation 0.4,
# hue 0.5, p=1, one factor per batch element shared across the frame
# stack, HSV ops in [0, 1] space) -------------------------------------


def _rgb2hsv(rgb: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """[..., 3] RGB in [0,1] -> HSV in [0,1] (transform_layer.rgb2hsv)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    cmax = jnp.max(rgb, -1)
    cmin = jnp.min(rgb, -1)
    delta = cmax - cmin
    hr = ((g - b) / (delta + eps)) % 6.0
    hg = (b - r) / (delta + eps) + 2.0
    hb = (r - g) / (delta + eps) + 4.0
    hue = jnp.where(cmax == r, hr, jnp.where(cmax == g, hg, hb))
    hue = jnp.where(cmax == 0.0, 0.0, hue) / 6.0
    sat = jnp.where(cmax == 0.0, 0.0, delta / (cmax + eps))
    return jnp.stack([hue, sat, cmax], -1)


def _hsv2rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] HSV in [0,1] -> RGB in [0,1] (transform_layer.hsv2rgb)."""
    hsv = jnp.clip(hsv, 0.0, 1.0)
    h = hsv[..., 0] * 6.0
    c = hsv[..., 2] * hsv[..., 1]
    x = c * (1.0 - jnp.abs(h % 2.0 - 1.0))
    m = hsv[..., 2] - c
    i = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, 5)
    z = jnp.zeros_like(c)
    sel = lambda vals: jnp.select([i == k for k in range(6)], vals)
    r = sel([c, x, z, z, x, c])
    g = sel([x, c, c, x, z, z])
    b = sel([z, z, x, c, c, x])
    return jnp.clip(jnp.stack([r + m, g + m, b + m], -1), 0.0, 1.0)


def color_jitter(key: jax.Array, imgs: jnp.ndarray,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4, hue: float = 0.5,
                 p: float = 1.0) -> jnp.ndarray:
    """RAD color jitter on stacked frames [B, H, W, 3k] in [0, 1].

    Mirrors the reference exactly: one factor per batch element,
    shared across the k stacked frames; brightness/saturation multiply
    the V/S channels, contrast interpolates around the per-frame mean,
    hue shifts by factor * 255/360 in [0,1) hue space (the reference's
    RAD-inherited scaling, kept verbatim); the HSV chain and the
    contrast op are applied in a random order (one coin per call) and
    each image is jittered with probability p."""
    b, h, w, C = imgs.shape
    k = C // 3
    x = imgs.reshape(b, h, w, k, 3)

    korder, kp, kb, kc, ks, kh = jax.random.split(key, 6)
    f_b = jax.random.uniform(kb, (b,), minval=max(0.0, 1 - brightness),
                             maxval=1 + brightness)
    f_c = jax.random.uniform(kc, (b,), minval=max(0.0, 1 - contrast),
                             maxval=1 + contrast)
    f_s = jax.random.uniform(ks, (b,), minval=max(0.0, 1 - saturation),
                             maxval=1 + saturation)
    f_h = jax.random.uniform(kh, (b,), minval=-hue, maxval=hue)
    bc = lambda f: f[:, None, None, None]

    def hsv_chain(x):
        hsv = _rgb2hsv(x)
        v = jnp.clip(hsv[..., 2] * bc(f_b), 0.0, 1.0)
        hch = (hsv[..., 0] + bc(f_h) * 255.0 / 360.0) % 1.0
        s = jnp.clip(hsv[..., 1] * bc(f_s), 0.0, 1.0)
        return _hsv2rgb(jnp.stack([hch, s, v], -1))

    def contrast_op(x):
        means = jnp.mean(x, axis=(1, 2), keepdims=True)
        return jnp.clip((x - means) * bc(f_c)[..., None] + means, 0.0, 1.0)

    a = contrast_op(hsv_chain(x))
    bpath = hsv_chain(contrast_op(x))
    out = jnp.where(jax.random.uniform(korder, ()) >= 0.5, bpath, a)

    take = jax.random.uniform(kp, (b,)) < p
    out = jnp.where(take[:, None, None, None, None], out, x)
    return out.reshape(b, h, w, C)


AUG_REGISTRY: Dict[str, Callable] = {
    "crop": random_crop,
    "translate": random_translate,
    "cutout": random_cutout,
    "grayscale": grayscale,
    "color_jitter": color_jitter,
    "no_aug": no_aug,
}
