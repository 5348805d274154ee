import jax
import jax.numpy as jnp
import numpy as np

from ssdx.data.augment import (
    AugmentConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
    augment_batch,
    preprocess_batch,
)


def _img_batch(rng, B=2, S=64):
    return rng.integers(0, 255, (B, S, S, 3), np.uint8)


def _boxes(rng, B=2, G=4, S=64):
    lo = rng.uniform(0, S * 0.6, (B, G, 2)).astype(np.float32)
    sz = rng.uniform(S * 0.15, S * 0.3, (B, G, 2)).astype(np.float32)
    boxes = np.concatenate([lo, np.minimum(lo + sz, S)], -1)
    labels = rng.integers(0, 5, (B, G)).astype(np.int32)
    valid = np.ones((B, G), bool)
    return boxes, labels, valid


_IDENTITY_CFG = AugmentConfig(
    zoom_out_prob=0.0,
    small_sampler_options=(2.0,),  # sentinel only -> identity window
    large_sampler_options=(2.0,),
    hflip_prob=0.0,
    photometric_prob=0.0,
)


def test_identity_config_matches_preprocess():
    rng = np.random.default_rng(0)
    imgs = _img_batch(rng)
    boxes, labels, valid = _boxes(rng)
    key = jax.random.key(0)
    img_a, b_a, l_a, v_a = augment_batch(
        key, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(valid), _IDENTITY_CFG)
    img_p, b_p = preprocess_batch(jnp.asarray(imgs), jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_p), atol=2e-2)
    np.testing.assert_allclose(np.asarray(b_a), np.asarray(b_p), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(v_a), valid)


def test_normalization_range():
    rng = np.random.default_rng(1)
    imgs = _img_batch(rng)
    boxes, labels, valid = _boxes(rng)
    img, b01 = preprocess_batch(jnp.asarray(imgs), jnp.asarray(boxes))
    assert img.shape == (2, 300, 300, 3)
    arr = np.asarray(img)
    for c in range(3):
        lo = (0 - IMAGENET_MEAN[c]) / IMAGENET_STD[c]
        hi = (1 - IMAGENET_MEAN[c]) / IMAGENET_STD[c]
        assert arr[..., c].min() >= lo - 1e-4 and arr[..., c].max() <= hi + 1e-4
    assert np.asarray(b01).max() <= 1.0


def test_forced_hflip_flips_boxes_and_pixels():
    rng = np.random.default_rng(2)
    imgs = _img_batch(rng, B=1)
    boxes, labels, valid = _boxes(rng, B=1, G=2)
    cfg = _IDENTITY_CFG._replace(hflip_prob=1.0)
    img, b01, _, v = augment_batch(
        jax.random.key(3), jnp.asarray(imgs), jnp.asarray(boxes),
        jnp.asarray(labels), jnp.asarray(valid), cfg)
    img_id, b_id = preprocess_batch(jnp.asarray(imgs), jnp.asarray(boxes))
    np.testing.assert_allclose(
        np.asarray(img[0]), np.asarray(img_id[0, :, ::-1, :]), atol=2e-2)
    exp = np.asarray(b_id[0]).copy()
    exp_fl = exp.copy()
    exp_fl[:, 0] = 1.0 - exp[:, 2]
    exp_fl[:, 2] = 1.0 - exp[:, 0]
    np.testing.assert_allclose(np.asarray(b01[0]), exp_fl, atol=1e-5)


def test_crop_keeps_at_least_one_box():
    """With real sampler options, every augmented image that had boxes must
    keep >= 1 valid box (crop windows must contain a box center)."""
    rng = np.random.default_rng(3)
    imgs = _img_batch(rng, B=8)
    boxes, labels, valid = _boxes(rng, B=8, G=4)
    cfg = AugmentConfig(hflip_prob=0.5, photometric_prob=0.0)
    for seed in range(5):
        _, b01, _, v = augment_batch(
            jax.random.key(seed), jnp.asarray(imgs), jnp.asarray(boxes),
            jnp.asarray(labels), jnp.asarray(valid), cfg)
        v = np.asarray(v)
        assert v.any(axis=1).all(), f"seed {seed}: an image lost all boxes"
        b = np.asarray(b01)
        assert b.min() >= 0 and b.max() <= 1


def test_no_boxes_passthrough():
    rng = np.random.default_rng(4)
    imgs = _img_batch(rng, B=2)
    boxes = np.zeros((2, 4, 4), np.float32)
    labels = np.zeros((2, 4), np.int32)
    valid = np.zeros((2, 4), bool)
    cfg = AugmentConfig(hflip_prob=0.0, photometric_prob=0.0)
    img, b01, _, v = augment_batch(
        jax.random.key(0), jnp.asarray(imgs), jnp.asarray(boxes),
        jnp.asarray(labels), jnp.asarray(valid), cfg)
    # image passes through un-cropped (identity window)
    img_id, _ = preprocess_batch(jnp.asarray(imgs), jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_id), atol=2e-2)
    assert not v.any()


def test_photometric_distort_changes_pixels_but_not_boxes():
    rng = np.random.default_rng(5)
    imgs = _img_batch(rng, B=2)
    boxes, labels, valid = _boxes(rng)
    cfg = _IDENTITY_CFG._replace(photometric_prob=1.0)
    img, b01, _, _ = augment_batch(
        jax.random.key(7), jnp.asarray(imgs), jnp.asarray(boxes),
        jnp.asarray(labels), jnp.asarray(valid), cfg)
    img_id, b_id = preprocess_batch(jnp.asarray(imgs), jnp.asarray(boxes))
    assert not np.allclose(np.asarray(img), np.asarray(img_id), atol=1e-3)
    np.testing.assert_allclose(np.asarray(b01), np.asarray(b_id), atol=1e-5)
    assert np.all(np.isfinite(np.asarray(img)))


def test_zoom_out_shrinks_boxes():
    rng = np.random.default_rng(6)
    imgs = _img_batch(rng, B=4)
    boxes, labels, valid = _boxes(rng, B=4)
    cfg = _IDENTITY_CFG._replace(zoom_out_prob=1.0)
    img, b01, _, v = augment_batch(
        jax.random.key(11), jnp.asarray(imgs), jnp.asarray(boxes),
        jnp.asarray(labels), jnp.asarray(valid), cfg)
    _, b_id = preprocess_batch(jnp.asarray(imgs), jnp.asarray(boxes))
    area = lambda b: np.clip(b[..., 2] - b[..., 0], 0, None) * np.clip(
        b[..., 3] - b[..., 1], 0, None)
    # zoom-out can only shrink normalized box area
    assert np.all(area(np.asarray(b01)) <= area(np.asarray(b_id)) + 1e-6)


def test_zoom_out_composes_with_iou_crop():
    """The reference chain applies RandomZoomOut AND ConditionalIoUCrop to
    the same image (SSD_model_train.ipynb cell 2); the sampled source window
    must reflect both: canvas area beyond the image (zoom) and real crops
    cutting into the image (not the pure zoom canvas)."""
    from ssdx.data.augment import _sample_window

    S = 64.0
    rng = np.random.default_rng(0)
    boxes = jnp.asarray([[4.0, 4.0, 16.0, 16.0], [40.0, 40.0, 60.0, 58.0]])
    labels = jnp.asarray([0, 1], jnp.int32)
    valid = jnp.asarray([True, True])
    cfg = AugmentConfig(zoom_out_prob=1.0)  # zoom always on, crops active

    wins = np.stack([
        np.asarray(_sample_window(jax.random.key(i), jnp.float32(S),
                                  boxes, labels, valid, cfg))
        for i in range(64)
    ])
    contains_image = (
        (wins[:, 0] <= 0) & (wins[:, 1] <= 0) & (wins[:, 2] >= S) & (wins[:, 3] >= S)
    )
    outside = (wins[:, 0] < -1e-3) | (wins[:, 1] < -1e-3) | \
              (wins[:, 2] > S + 1e-3) | (wins[:, 3] > S + 1e-3)
    # some draws keep the whole zoomed canvas (sentinel crop on zoomed image)
    assert contains_image.any()
    # some draws crop INTO the image after zooming (window not a superset)
    assert (~contains_image).any()
    # and zoom is visible: some windows extend past the source bounds
    assert outside.any()


def test_composed_window_no_zoom_matches_crop_only():
    """With zoom_out_prob=0 the composition must reduce to the plain
    ConditionalIoUCrop window (regression guard for the refactor)."""
    from ssdx.data.augment import _sample_window

    S = 64.0
    boxes = jnp.asarray([[4.0, 4.0, 16.0, 16.0]])
    labels = jnp.asarray([0], jnp.int32)
    valid = jnp.asarray([True])
    cfg = AugmentConfig(zoom_out_prob=0.0)
    for i in range(16):
        win = np.asarray(_sample_window(jax.random.key(i), jnp.float32(S),
                                        boxes, labels, valid, cfg))
        assert win[0] >= -1e-4 and win[1] >= -1e-4
        assert win[2] <= S + 1e-4 and win[3] <= S + 1e-4
        assert win[2] > win[0] and win[3] > win[1]
