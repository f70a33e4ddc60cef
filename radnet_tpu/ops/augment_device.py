"""Batched on-device photometric augmentation.

TPU-native counterpart of the photometric half of the reference's
augmentation stack (/root/reference/faster_rcnn/augmentation.py:303-478):
brightness shift, intensity rescale ("contrast"), salt-and-pepper /
gaussian / poisson noise - with the same probabilities, parameter ranges,
grey-image handling and zero-background preservation.

Why: the host pipeline generates full-image float noise fields per sample
(profiled at ~70% of host sample time on a single core), while these ops
are elementwise - exactly what the TPU's VPU does for free alongside the
matmuls.  With ``Config.augment_photometric_on_device`` the host pipeline
skips its photometric stage and the fused train step applies this batched
version to the uint8 canvases already on device, driven by ``jax.random``.

Semantics note (documented difference): the host path applies photometric
ops to the full-resolution tile *before* the resize to the canvas; the
device path necessarily applies them *after* (the canvas is what ships).
Global ops (brightness/contrast) commute with the resize except at
background boundaries; per-pixel noise applied post-resize is not averaged
by the downscale, i.e. it is a slightly stronger regularizer at the same
parameter ranges.  Training parity with the reference is statistical, not
bitwise, either way (SURVEY.md §7 "RNG parity").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Reference brightness/contrast window (augmentation.py:308,339).
_MAX_B, _MIN_B = 180.0, 75.0


def _brightness(img, key):
    """Brightness shift weighted by current brightness; zero background
    preserved (augmentation.py:303-333).  ``img``: float32 (H, W, C) in
    0..255."""
    background = img == 0
    n_fg = jnp.maximum(jnp.sum(~background), 1)
    # Background pixels are exactly 0, so sum(all) == sum(foreground).
    avg = jnp.sum(img) / n_fg.astype(jnp.float32)
    p = (avg - _MIN_B) / (_MAX_B - _MIN_B)
    k1, k2 = jax.random.split(key)
    down = jax.random.uniform(k1) < p
    mag = jax.random.uniform(k2)
    delta = jnp.where(down, -mag * (avg - _MIN_B), mag * (_MAX_B - avg))
    # uint8 truncation parity: astype(np.uint8) floors (augmentation.py:330).
    out = jnp.floor(jnp.clip(img + delta, 0.0, 255.0))
    out = jnp.where(background, 0.0, out)
    # Applied only while the average sits inside the window.
    return jnp.where((avg > _MIN_B) & (avg < _MAX_B), out, img)


def _contrast(img, key):
    """Random intensity rescale (augmentation.py:335-351).  The reference's
    rescale_intensity casts back to uint8 with a plain astype - truncation,
    not rounding (the noise ops go through img_as_ubyte, which rounds)."""
    k1, k2 = jax.random.split(key)
    lo = _MIN_B * jax.random.uniform(k1)
    hi = (255.0 - _MAX_B) * jax.random.uniform(k2) + _MAX_B
    out = jnp.clip((img - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0) * 255.0
    return jnp.floor(out)


def _salt_and_pepper(x, key):
    """x in [0, 1] (augmentation.py:353-397)."""
    k1, k2, k3 = jax.random.split(key, 3)
    amount = (0.3 - 0.01) * jax.random.uniform(k1) + 0.01
    # truncnorm(mean .5, sd .1, low 0, upp 1) - augmentation.py:14-15,357.
    svp = jax.random.truncated_normal(k2, -5.0, 5.0) * 0.1 + 0.5
    r = jax.random.uniform(k3, x.shape)
    return jnp.where(r < amount * svp, 1.0, jnp.where(r < amount, 0.0, x))


def _gaussian(x, key):
    """(augmentation.py:399-441)"""
    k1, k2, k3 = jax.random.split(key, 3)
    mean = 0.1 * jax.random.uniform(k1) - 0.05
    var = (0.01 - 0.001) * jax.random.uniform(k2) + 0.001
    return x + jax.random.normal(k3, x.shape) * jnp.sqrt(var) + mean


def _poisson(x, key):
    """(augmentation.py:443-478): scale by #unique values rounded up to a
    power of two, draw poisson.  x derives from uint8/255, so the unique
    count is the number of occupied uint8 bins - a fixed-shape bincount
    instead of a (jit-hostile) dynamic ``unique``."""
    bins = jnp.bincount(
        jnp.rint(x * 255.0).astype(jnp.int32).ravel(), length=256
    )
    n_unique = jnp.maximum(jnp.sum(bins > 0), 2)
    vals = 2.0 ** jnp.ceil(jnp.log2(n_unique.astype(jnp.float32)))
    return jax.random.poisson(key, x * vals).astype(jnp.float32) / vals


def _noise_one_of_four(img, key, grey):
    """One of {s&p, gaussian, poisson, contrast} picked uniformly
    (augmentation.py:518-528); noise ops run grey-aware with zero
    background re-imposed (augmentation.py:363-397 pattern).

    ``grey`` is either a python bool (static: only that variant is
    compiled - the usual homogeneous-config case) or a traced boolean
    scalar (per-sample grey detection for mixed grey/color batches under
    ``use_img_type``; both variants are computed and selected)."""
    k_pick, k_op = jax.random.split(key)
    r = jax.random.randint(k_pick, (), 0, 4)

    def variant(as_grey: bool):
        if as_grey:
            plane = img[..., 0]  # grey panels: identical channels
            background = plane == 0
        else:
            plane = img
            background = img == 0
        x = plane / 255.0
        candidates = jnp.stack(
            [
                _salt_and_pepper(x, k_op),
                _gaussian(x, k_op),
                _poisson(x, k_op),
            ]
        )
        noisy = candidates[r % 3]  # r==3 selects contrast below
        # img_as_ubyte rounding (augmentation.py via skimage): rint after
        # clip.
        noisy = jnp.rint(jnp.clip(noisy, 0.0, 1.0) * 255.0)
        noisy = jnp.where(background, 0.0, noisy)
        if as_grey:
            noisy = jnp.repeat(noisy[..., None], img.shape[-1], axis=-1)
        return noisy

    if isinstance(grey, bool):
        noisy = variant(grey)
    else:
        noisy = jnp.where(grey, variant(True), variant(False))
    return jnp.where(r == 3, _contrast(img, k_op), noisy)


def grey_mode(config) -> bool | None:
    """The ``grey`` argument the production callers should pass.

    The host path keys grey-aware noise on each sample's image type
    (data/augment.py); on device the flag must therefore be per-sample
    when a run can mix grey and color canvases in one batch.  Returns a
    static bool when every type the run can draw agrees (compiles only
    that variant), else ``None`` (= detect per sample from the pixels)."""
    types = list(config.img_types) if config.use_img_type else list(config.img_types[:1])
    flags = ["grey" in t for t in types] or [False]
    return flags[0] if all(f == flags[0] for f in flags) else None


@functools.partial(
    jax.jit, static_argnames=("grey", "use_brightness", "use_noise")
)
def photometric_augment(
    images: jnp.ndarray,
    key: jax.Array,
    grey: bool | None,
    use_brightness: bool = True,
    use_noise: bool = True,
) -> jnp.ndarray:
    """Apply the reference's photometric schedule to a batch of canvases.

    ``images``: uint8 (B, H, W, C) BGR canvases (zero-padded).  Returns
    float32 in 0..255 (callers mean-center next; no uint8 round-trip).
    Brightness at p=0.5, then one of the four noise/contrast ops at p=0.5
    (augmentation.py:514-528), independently per sample.

    ``grey``: True/False applies that noise variant to the whole batch;
    ``None`` detects greyness per sample from channel equality (batches
    can mix grey and color canvases when ``use_img_type`` draws from
    mixed image types - see :func:`grey_mode`).
    """

    def per_sample(img_u8, key):
        img = img_u8.astype(jnp.float32)
        if grey is None and img.shape[-1] >= 3:
            g = jnp.all(img[..., 0] == img[..., 1]) & jnp.all(
                img[..., 1] == img[..., 2]
            )
        else:
            g = bool(grey) if grey is not None else False
        k_bc, k_b, k_nc, k_n = jax.random.split(key, 4)
        if use_brightness:
            img = jnp.where(
                jax.random.uniform(k_bc) < 0.5, _brightness(img, k_b), img
            )
        if use_noise:
            img = jnp.where(
                jax.random.uniform(k_nc) < 0.5,
                _noise_one_of_four(img, k_n, g),
                img,
            )
        return img

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(per_sample)(images, keys)
