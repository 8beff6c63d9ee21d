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
    """Deterministic eval-time crop."""
    h = imgs.shape[1]
    off = (h - out_size) // 2
    return imgs[:, off:off + out_size, off:off + out_size, :]


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


AUG_REGISTRY: Dict[str, Callable] = {
    "crop": random_crop,
    "translate": random_translate,
    "cutout": random_cutout,
    "grayscale": grayscale,
    "no_aug": no_aug,
}
