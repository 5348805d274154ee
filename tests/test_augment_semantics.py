"""Distributional parity of the fixed-shape IoU-crop sampler against a
faithful host-side implementation of torchvision v2 RandomIoUCrop's loop
(the reference relies on it via ConditionalIoUCrop, SSD_trainer.py:979-1003;
torchvision _get_params: outer infinite loop drawing one option per round —
sentinel >= 1.0 returns identity — inner loop of `trials` candidates judged
by aspect bound, center containment, and max IoU over center-inside boxes).

The jitted sampler truncates the outer loop at cfg.outer_rounds; these tests
quantify that truncation (residual failure probability) and assert the
summary statistics that drive training (crop rate, window area fraction,
box survival) match the faithful loop within sampling noise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdx.data.augment import AugmentConfig, _sample_iou_crop

CFG = AugmentConfig()
SIZE = 512.0


def _host_iou_crop(rng, size, boxes, min_scale, options, cfg, max_rounds=1000):
    """Reference-faithful RandomIoUCrop._get_params (continuous w/h form —
    both implementations sample w,h as U[min_scale,max_scale]*size, so the
    comparison isolates the loop structure).  Returns (window, rounds_used).
    """
    for round_i in range(max_rounds):
        opt = options[rng.integers(0, len(options))]
        if opt >= 1.0:
            return np.array([0.0, 0.0, size, size]), round_i + 1
        for _ in range(cfg.trials):
            w = rng.uniform(min_scale, cfg.max_scale) * size
            h = rng.uniform(min_scale, cfg.max_scale) * size
            if not (cfg.min_aspect_ratio <= w / h <= cfg.max_aspect_ratio):
                continue
            x0 = rng.uniform(0, size - w)
            y0 = rng.uniform(0, size - h)
            win = np.array([x0, y0, x0 + w, y0 + h])
            cx = 0.5 * (boxes[:, 0] + boxes[:, 2])
            cy = 0.5 * (boxes[:, 1] + boxes[:, 3])
            inside = (cx > win[0]) & (cx < win[2]) & (cy > win[1]) & (cy < win[3])
            if not inside.any():
                continue
            bx = boxes[inside]
            lt = np.maximum(win[:2], bx[:, :2])
            rb = np.minimum(win[2:], bx[:, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[:, 0] * wh[:, 1]
            area_w = (win[2] - win[0]) * (win[3] - win[1])
            area_b = (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1])
            iou = inter / np.clip(area_w + area_b - inter, 1e-7, None)
            if iou.max() >= opt:
                return win, round_i + 1
    return np.array([0.0, 0.0, size, size]), max_rounds


def _random_boxes(rng, g):
    lo = rng.uniform(0.05, 0.7, (g, 2)) * SIZE
    sz = rng.uniform(0.03, 0.25, (g, 2)) * SIZE
    return np.concatenate([lo, np.minimum(lo + sz, SIZE)], axis=1)


def _stats(windows):
    windows = np.asarray(windows)
    area = (windows[:, 2] - windows[:, 0]) * (windows[:, 3] - windows[:, 1])
    frac = area / (SIZE * SIZE)
    cropped = frac < 0.999
    return float(cropped.mean()), float(frac[cropped].mean() if cropped.any() else 1.0)


@pytest.mark.parametrize("policy", ["small", "large"])
def test_crop_distribution_matches_host_loop(policy):
    n = 400
    min_scale = CFG.small_min_scale if policy == "small" else CFG.large_min_scale
    options = (CFG.small_sampler_options if policy == "small"
               else CFG.large_sampler_options)

    rng = np.random.default_rng(11)
    box_sets = [_random_boxes(rng, int(rng.integers(1, 6))) for _ in range(n)]

    host_wins = [
        _host_iou_crop(np.random.default_rng(1000 + i), SIZE, box_sets[i],
                       min_scale, np.asarray(options), CFG)[0]
        for i in range(n)
    ]

    sample = jax.jit(
        lambda k, b, v: _sample_iou_crop(
            k, SIZE, b, v, min_scale, options, CFG),
        static_argnames=(),
    )
    keys = jax.random.split(jax.random.key(3), n)
    G = 8
    jax_wins = []
    for i in range(n):
        b = np.zeros((G, 4), np.float32)
        g = len(box_sets[i])
        b[:g] = box_sets[i]
        v = np.zeros(G, bool)
        v[:g] = True
        jax_wins.append(np.asarray(sample(keys[i], jnp.asarray(b), jnp.asarray(v))))

    rate_h, frac_h = _stats(host_wins)
    rate_j, frac_j = _stats(jax_wins)
    # binomial std error at n=400 is ~2.5%; allow 3-sigma-ish bands
    assert abs(rate_h - rate_j) < 0.10, (rate_h, rate_j)
    assert abs(frac_h - frac_j) < 0.08, (frac_h, frac_j)


def test_outer_loop_truncation_residual_is_negligible():
    """The fixed-shape sampler truncates torchvision's infinite outer loop at
    cfg.outer_rounds; measure how often the faithful loop needs more rounds."""
    rng = np.random.default_rng(5)
    over = 0
    n = 500
    for i in range(n):
        boxes = _random_boxes(rng, int(rng.integers(1, 6)))
        _, rounds = _host_iou_crop(
            np.random.default_rng(i), SIZE, boxes, CFG.small_min_scale,
            np.asarray(CFG.small_sampler_options), CFG)
        if rounds > CFG.outer_rounds:
            over += 1
    assert over / n < 1e-2, f"{over}/{n} draws needed > {CFG.outer_rounds} rounds"


def test_sentinel_only_options_give_identity():
    win = _sample_iou_crop(
        jax.random.key(0), SIZE,
        jnp.asarray([[100.0, 100.0, 200.0, 200.0]]), jnp.asarray([True]),
        0.3, (2.0,), CFG)
    np.testing.assert_allclose(np.asarray(win), [0, 0, SIZE, SIZE])
