"""Cross-library parity vs cv2 — the reference's actual native backend.

The reference's augmentation/preprocessing bottoms out in OpenCV:
PerspectiveTransform is monkey-patched onto cv2.warpPerspective
(reference: common_blocks/augmentation.py:9-32), PadFixed calls
cv2.copyMakeBorder with reflect101/replicate borders
(reference: augmentation.py:119-131), and imgaug's affine path is
cv2.warpAffine. Bit-parity with the *time-seeded* imgaug policies is
impossible (reference: utils.py:355-368), but the deterministic
geometry primitives CAN be pinned against cv2 directly — which these
tests do, closing ROADMAP #6's "parity sweep against the reference
backend on fixed inputs" at the op level:

- bilinear_sample            == cv2.remap(INTER_LINEAR, BORDER_REPLICATE)
- pad (edge / reflect paths) == cv2.copyMakeBorder(REPLICATE / REFLECT_101)
- _homography                == cv2.getPerspectiveTransform
- affine warp branch         == cv2.warpAffine(WARP_INVERSE_MAP)
- resize_hw (upsample)       == cv2.resize(INTER_LINEAR)

cv2.remap quantizes fractional coordinates to 1/32 (INTER_BITS=5), so
exact-agreement tests feed coordinates already on that grid; the
free-coordinate tests bound the error by the table quantization.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from salt_tpu.ops import augment, preprocess


def _img(seed=0, h=101, w=101):
    return np.random.RandomState(seed).rand(h, w).astype(np.float32)


# ---------------------------------------------------------------------------
# bilinear_sample vs cv2.remap
# ---------------------------------------------------------------------------

def test_bilinear_sample_matches_cv2_remap_exact_on_table_grid():
    """Coordinates on cv2's 1/32 interpolation grid: near-exact match,
    including the edge-clamp (BORDER_REPLICATE) behavior for
    out-of-range samples."""
    h, w = 64, 64
    img = _img(0, h, w)
    rng = np.random.RandomState(1)
    # deliberately overshoot the valid range to exercise the clamp
    ys = rng.uniform(-5, h + 4, (h, w)).astype(np.float32)
    xs = rng.uniform(-5, w + 4, (h, w)).astype(np.float32)
    ys = np.round(ys * 32) / 32
    xs = np.round(xs * 32) / 32

    got = augment.bilinear_sample(jnp.asarray(img)[None],
                                  jnp.asarray(ys)[None],
                                  jnp.asarray(xs)[None])
    ref = cv2.remap(img, xs, ys, interpolation=cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(np.asarray(got)[0], ref, atol=2e-5)


def test_bilinear_sample_matches_cv2_remap_free_coords():
    """Arbitrary float coordinates: agreement bounded by cv2's own
    1/32 fixed-point table quantization (<= range/64 per tap)."""
    h, w = 101, 101
    img = _img(2, h, w)
    rng = np.random.RandomState(3)
    ys = rng.uniform(0, h - 1, (h, w)).astype(np.float32)
    xs = rng.uniform(0, w - 1, (h, w)).astype(np.float32)
    got = augment.bilinear_sample(jnp.asarray(img)[None],
                                  jnp.asarray(ys)[None],
                                  jnp.asarray(xs)[None])
    ref = cv2.remap(img, xs, ys, interpolation=cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REPLICATE)
    err = np.abs(np.asarray(got)[0] - ref)
    assert err.max() < 0.04 and err.mean() < 0.005


# ---------------------------------------------------------------------------
# pad paths vs cv2.copyMakeBorder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method,border", [
    ("edge", cv2.BORDER_REPLICATE),
    ("reflect", cv2.BORDER_REFLECT_101),
])
def test_pad_to_divisor_matches_cv2_copymakeborder(method, border):
    """The production 101->128 pad (reference InferencePad split,
    top/right/bottom/left = 13/14/14/13) against cv2's border ops —
    REFLECT_101 is exactly the reference PadFixed 'reflect_101' branch
    (reference: augmentation.py:119-131)."""
    img = _img(4)
    got = np.asarray(preprocess.pad_to_divisor(jnp.asarray(img), 64,
                                               method=method))
    top, right, bottom, left = preprocess.get_crop_pad_sequence(27, 27)
    ref = cv2.copyMakeBorder(img, top, bottom, left, right, border)
    assert got.shape == (128, 128)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("method,border", [
    ("edge", cv2.BORDER_REPLICATE),
    ("reflect", cv2.BORDER_REFLECT_101),
])
def test_pad_fixed_matches_cv2_copymakeborder(method, border):
    img = _img(5, 32, 40)
    got = np.asarray(preprocess.pad_fixed(jnp.asarray(img), (7, 11),
                                          method=method))
    ref = cv2.copyMakeBorder(img, 7, 7, 11, 11, border)
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# homography solver vs cv2.getPerspectiveTransform
# ---------------------------------------------------------------------------

def test_homography_matches_cv2_getperspectivetransform():
    """Ours maps dst(y,x)->src(y,x); cv2.getPerspectiveTransform(dst,
    src) maps dst(x,y)->src(x,y). Conjugating by the coordinate swap
    must give the same matrix up to the projective scale."""
    h, w = 101.0, 101.0
    dst = np.array([[0.0, 0.0], [0.0, w - 1], [h - 1, 0.0],
                    [h - 1, w - 1]], np.float32)          # (y, x)
    rng = np.random.RandomState(6)
    src = dst + rng.uniform(-8, 8, (4, 2)).astype(np.float32)

    H = np.asarray(augment._homography(jnp.asarray(dst),
                                       jnp.asarray(src)[None]))[0]
    P = np.array([[0.0, 1, 0], [1, 0, 0], [0, 0, 1]])
    H_xy = P @ H @ P                                       # to (x, y)
    M = cv2.getPerspectiveTransform(dst[:, ::-1], src[:, ::-1])
    np.testing.assert_allclose(H_xy / H_xy[2, 2], M / M[2, 2],
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# the affine warp branch vs cv2.warpAffine
# ---------------------------------------------------------------------------

def test_affine_branch_matches_cv2_warpaffine():
    """Rebuild the make_warp_coords affine map (rotate about center +
    x-translate, augment.py:148-153) for fixed (theta, tx) and check
    the warped image against cv2.warpAffine with the equivalent
    inverse map — i.e. the reference's imgaug-Affine-via-cv2 execution
    of the same policy (reference: augmentation.py:40-42)."""
    h, w = 101, 101
    img = _img(7, h, w)
    theta, tx = np.deg2rad(7.5), 3.2
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = np.cos(theta), np.sin(theta)

    iy, ix = np.mgrid[0:h, 0:w].astype(np.float32)
    y0 = iy - cy
    x0 = ix - cx - tx
    ys = cos * y0 + sin * x0 + cy
    xs = -sin * y0 + cos * x0 + cx
    got = augment.bilinear_sample(jnp.asarray(img)[None],
                                  jnp.asarray(ys)[None],
                                  jnp.asarray(xs)[None])

    # same dst->src map in cv2 (x, y) convention
    M_inv = np.array([
        [cos, -sin, -cos * (cx + tx) + sin * cy + cx],
        [sin, cos, -sin * (cx + tx) - cos * cy + cy],
    ], np.float64)
    ref = cv2.warpAffine(img, M_inv, (w, h),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderMode=cv2.BORDER_REPLICATE)
    err = np.abs(np.asarray(got)[0] - ref)
    assert err.max() < 0.04 and err.mean() < 0.005


# ---------------------------------------------------------------------------
# resize convention vs cv2.resize
# ---------------------------------------------------------------------------

def test_resize_upsample_matches_cv2_inter_linear():
    """The resize_and_pad loader's 101->102 upsample: jax.image.resize
    'linear' shares cv2.INTER_LINEAR's half-pixel-center convention
    (antialiasing only differs on downsample, which this path never
    does). Reference: augmentation.py:79-86 resize_pad_seq."""
    img = _img(8)
    got = np.asarray(preprocess.resize_hw(jnp.asarray(img), (102, 102)))
    ref = cv2.resize(img, (102, 102), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, ref, atol=1e-3)
