"""On-device stochastic augmentation, keyed by jax.random.

Replaces the reference's imgaug/cv2 policies executed per-item in
DataLoader workers (reference: common_blocks/augmentation.py:34-64
``affine_seq``/``intensity_seq``, dispatched at main.py:130-139) with a
single vmapped, jitted batch transform. Differences by design:

- determinism: the reference reseeds augmenters from time+pid
  (reference: utils.py:355-368), i.e. runs are irreproducible; here every
  stochastic choice derives from an explicit PRNG key.
- geometry is composed into ONE warp: affine (rotate +-10deg, translate
  +-5%), optional perspective (corner jitter, p=0.3), and optional
  piecewise/elastic field (p=0.3) combine into a single coordinate map
  and one bilinear gather per image (the reference warps the image
  repeatedly through separate cv2/skimage passes).
- imgaug's SomeOf((1,2), [fliplr, sharpen, emboss, affine]) draws 1-2 of
  4 ops; we gate each candidate independently with p=0.375 (same expected
  op count). Bit-parity with imgaug is impossible anyway (time-seeded);
  parity target is distribution/metric level (SURVEY.md section 7.3).

Intensity policy (image-only, reference: augmentation.py:50-64): invert
p=0.3, contrast-normalize p=0.3 (alpha in [0.5, 1.5]), then one of
{noop, add +-10/255, add-elementwise, multiply x[0.95, 1.05],
multiply-elementwise}.

All functions take/return float images in [0, 1], shape [H, W] per image
([B, H, W] for the batch API). Masks receive only the geometric ops.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


# ---------------------------------------------------------------------------
# geometry: one composed coordinate map + one gather
# ---------------------------------------------------------------------------

def _affine_params(key, h, w, rotate_deg=10.0, translate_frac=0.05):
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jnp.deg2rad(jax.random.uniform(k1, (), minval=-rotate_deg,
                                           maxval=rotate_deg))
    tx = jax.random.uniform(k2, (), minval=-translate_frac,
                            maxval=translate_frac) * w
    # reference affine translates x only (augmentation.py:40-42)
    return theta, tx


def _rot_translate_coords(ys, xs, theta, tx, h, w):
    """Inverse-map output grid coords through rotation-about-center +
    x-translation."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    y0 = ys - cy
    x0 = xs - cx - tx
    src_y = cos * y0 + sin * x0 + cy
    src_x = -sin * y0 + cos * x0 + cx
    return src_y, src_x


def _perspective_coords(key, ys, xs, h, w, scale_lo=0.05, scale_hi=0.10):
    """Corner-jitter homography (reference: augmentation.py:47
    PerspectiveTransform(scale=(0.05, 0.1)); cv2 semantics via the
    monkey-patch at augmentation.py:9-32). Returns inverse-mapped
    source coordinates for the output grid."""
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (), minval=scale_lo, maxval=scale_hi)
    jitter = jax.random.normal(k2, (4, 2)) * scale * jnp.array([h, w])
    dst = jnp.array([[0.0, 0.0], [0.0, w - 1], [h - 1, 0.0],
                     [h - 1, w - 1]])
    src = dst + jitter
    # solve homography mapping dst -> src (8 unknowns)
    def rows(d, s):
        y, x = d
        sy, sx = s
        return jnp.array([
            [y, x, 1, 0, 0, 0, -y * sy, -x * sy],
            [0, 0, 0, y, x, 1, -y * sx, -x * sx],
        ]), jnp.array([sy, sx])
    A_rows, b_rows = jax.vmap(rows)(dst, src)
    A = A_rows.reshape(8, 8)
    b = b_rows.reshape(8)
    hvec = jnp.linalg.solve(A, b)
    H = jnp.concatenate([hvec, jnp.ones(1)]).reshape(3, 3)
    denom = H[2, 0] * ys + H[2, 1] * xs + H[2, 2]
    src_y = (H[0, 0] * ys + H[0, 1] * xs + H[0, 2]) / denom
    src_x = (H[1, 0] * ys + H[1, 1] * xs + H[1, 2]) / denom
    return src_y, src_x


def _elastic_field(key, h, w, scale_lo=0.04, scale_hi=0.08, grid=5):
    """Smooth displacement field ~ imgaug PiecewiseAffine(scale=(0.04,
    0.08)) (reference: augmentation.py:46): coarse random offsets on a
    grid, bilinearly upsampled."""
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (), minval=scale_lo, maxval=scale_hi)
    coarse = jax.random.normal(k2, (2, grid, grid)) * scale * jnp.array(
        [h, w]).reshape(2, 1, 1) * 0.5
    field = jax.image.resize(coarse, (2, h, w), method="linear")
    return field[0], field[1]


def geometric_warp(key, img: jax.Array, mask: Optional[jax.Array],
                   p_affine: float = 0.375, p_flip: float = 0.375,
                   p_perspective: float = 0.3, p_piecewise: float = 0.3
                   ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Compose flip + affine + perspective + elastic into one gather."""
    h, w = img.shape[-2], img.shape[-1]
    kf, ka, kp, ke, kg = jax.random.split(key, 5)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    # flip (applied to the coordinate map so it fuses with the warp)
    do_flip = jax.random.bernoulli(kf, p_flip)
    xs = jnp.where(do_flip, (w - 1) - xs, xs)

    # affine
    do_aff = jax.random.bernoulli(ka, p_affine)
    theta, tx = _affine_params(jax.random.fold_in(ka, 1), h, w)
    ys_a, xs_a = _rot_translate_coords(ys, xs, theta, tx, h, w)
    ys = jnp.where(do_aff, ys_a, ys)
    xs = jnp.where(do_aff, xs_a, xs)

    # perspective
    do_persp = jax.random.bernoulli(kp, p_perspective)
    ys_p, xs_p = _perspective_coords(jax.random.fold_in(kp, 1), ys, xs, h, w)
    ys = jnp.where(do_persp, ys_p, ys)
    xs = jnp.where(do_persp, xs_p, xs)

    # piecewise/elastic
    do_pw = jax.random.bernoulli(ke, p_piecewise)
    dy, dx = _elastic_field(jax.random.fold_in(ke, 1), h, w)
    ys = jnp.where(do_pw, ys + dy, ys)
    xs = jnp.where(do_pw, xs + dx, xs)

    coords = jnp.stack([ys, xs])
    warped = map_coordinates(img, coords, order=1, mode="nearest")
    warped_mask = None
    if mask is not None:
        warped_mask = map_coordinates(mask, coords, order=1, mode="nearest")
    return warped, warped_mask


# ---------------------------------------------------------------------------
# kernel filters (sharpen / emboss, image only)
# ---------------------------------------------------------------------------

_SHARPEN_K = jnp.array([[-1, -1, -1], [-1, 17, -1], [-1, -1, -1]],
                       jnp.float32) / 9.0
_EMBOSS_K = jnp.array([[-1, -1, 0], [-1, 1, 1], [0, 1, 1]], jnp.float32)


def _conv3(img: jax.Array, kernel: jax.Array) -> jax.Array:
    x = img[None, :, :, None]
    k = kernel[:, :, None, None]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0, :, :, 0]


def filter_ops(key, img: jax.Array, p_sharpen: float = 0.375,
               p_emboss: float = 0.375) -> jax.Array:
    """Sharpen(alpha=.5)/Emboss(alpha=.5, strength=1)
    (reference: augmentation.py:38-39); alpha blends with the input."""
    ks, ke = jax.random.split(key)
    sharp = 0.5 * img + 0.5 * _conv3(img, _SHARPEN_K)
    img = jnp.where(jax.random.bernoulli(ks, p_sharpen), sharp, img)
    emb = 0.5 * img + 0.5 * jnp.clip(_conv3(img, _EMBOSS_K) + 0.5, 0, 1)
    img = jnp.where(jax.random.bernoulli(ke, p_emboss), emb, img)
    return jnp.clip(img, 0.0, 1.0)


# ---------------------------------------------------------------------------
# intensity policy (image only)
# ---------------------------------------------------------------------------

def intensity_ops(key, img: jax.Array) -> jax.Array:
    """reference: augmentation.py:50-64 ``intensity_seq``."""
    k_inv, k_cn, k_cna, k_pick, k_val, k_noise = jax.random.split(key, 6)
    img = jnp.where(jax.random.bernoulli(k_inv, 0.3), 1.0 - img, img)
    alpha = jax.random.uniform(k_cna, (), minval=0.5, maxval=1.5)
    contrasted = jnp.clip((img - 0.5) * alpha + 0.5, 0.0, 1.0)
    img = jnp.where(jax.random.bernoulli(k_cn, 0.3), contrasted, img)

    # OneOf{noop x4-weighted-as-half, add, add_elem, mul, mul_elem}
    branch = jax.random.randint(k_pick, (), 0, 8)   # 0-3 noop (p=0.5)
    add_v = jax.random.uniform(k_val, (), minval=-10 / 255, maxval=10 / 255)
    mul_v = jax.random.uniform(k_val, (), minval=0.95, maxval=1.05)
    noise = jax.random.uniform(k_noise, img.shape, minval=-1.0, maxval=1.0)
    img = jnp.where(branch == 4, img + add_v, img)
    img = jnp.where(branch == 5, img + noise * (10 / 255), img)
    img = jnp.where(branch == 6, img * mul_v, img)
    img = jnp.where(branch == 7, img * (1.0 + noise * 0.05), img)
    return jnp.clip(img, 0.0, 1.0)


# ---------------------------------------------------------------------------
# batch API
# ---------------------------------------------------------------------------

def augment_image(key, img: jax.Array, mask: Optional[jax.Array] = None):
    """Full training policy for one [H, W] image (+mask)."""
    kg, kf, ki = jax.random.split(key, 3)
    img, mask = geometric_warp(kg, img, mask)
    img = filter_ops(kf, img)
    img = intensity_ops(ki, img)
    return img, mask


@jax.jit
def augment_batch(rng, images: jax.Array, masks: jax.Array):
    """vmapped policy over [B, H, W] float images + masks."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(augment_image)(keys, images, masks)


@jax.jit
def augment_batch_images(rng, images: jax.Array):
    keys = jax.random.split(rng, images.shape[0])
    aug = jax.vmap(lambda k, im: augment_image(k, im)[0])(keys, images)
    return aug
