import numpy as np
import jax.numpy as jnp

from ssdx.losses import multibox_loss, smooth_l1, cross_entropy_per_prior


def _oracle(loc_pred, logits, loc_t, cls_t, pos, ratio):
    """Direct per-image loop transcription of the reference loss semantics
    (SSD_trainer.py:104-117, 551-600)."""
    B, P, C = logits.shape
    num_pos = pos.sum(axis=1)
    total_pos = max(num_pos.sum(), 1.0)

    d = loc_pred - loc_t
    ad = np.abs(d)
    l1 = np.where(ad < 1, 0.5 * ad * ad, ad - 0.5)
    loc_loss = l1[pos].sum() / total_pos

    z = logits - logits.max(axis=-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
    ce = -np.take_along_axis(logp, cls_t[..., None], axis=-1)[..., 0]

    ce_pos = ce[pos].sum()
    ce_neg = 0.0
    for i in range(B):
        n_pos = int(num_pos[i])
        max_negs = int(ratio) if n_pos == 0 else int(ratio * n_pos)
        neg = ce[i][~pos[i]]
        if neg.size == 0 or max_negs == 0:
            continue
        k = min(max_negs, neg.size)
        ce_neg += np.sort(neg)[::-1][:k].sum()
    conf_loss = (ce_pos + ce_neg) / total_pos
    return loc_loss + conf_loss, loc_loss, conf_loss


def _random_case(rng, B=4, P=50, C=6, frac_pos=0.1):
    loc_pred = rng.normal(size=(B, P, 4)).astype(np.float32)
    logits = rng.normal(size=(B, P, C)).astype(np.float32) * 2
    loc_t = rng.normal(size=(B, P, 4)).astype(np.float32)
    cls_t = rng.integers(0, C, (B, P)).astype(np.int32)
    pos = rng.uniform(size=(B, P)) < frac_pos
    cls_t = np.where(pos, np.maximum(cls_t, 1), 0)
    return loc_pred, logits, loc_t, cls_t, pos


def test_smooth_l1_values():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(smooth_l1(x)), [1.5, 0.125, 0.0, 0.125, 1.5], atol=1e-6)


def test_ce_matches_softmax():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 5, 6)).astype(np.float32)
    labels = rng.integers(0, 6, (2, 5)).astype(np.int32)
    ce = np.asarray(cross_entropy_per_prior(jnp.asarray(logits), jnp.asarray(labels)))
    z = logits - logits.max(-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    exp = -np.take_along_axis(logp, labels[..., None], -1)[..., 0]
    np.testing.assert_allclose(ce, exp, atol=1e-4)


def test_multibox_vs_oracle():
    rng = np.random.default_rng(1)
    for frac in (0.1, 0.0, 0.5):
        args = _random_case(rng, frac_pos=frac)
        got = multibox_loss(*map(jnp.asarray, args), neg_pos_ratio=3.0)
        exp = _oracle(*args, ratio=3.0)
        for g, e in zip(got, exp):
            np.testing.assert_allclose(float(g), e, rtol=1e-4)


def test_zero_positives_still_mines_negatives():
    rng = np.random.default_rng(2)
    loc_pred, logits, loc_t, cls_t, pos = _random_case(rng, frac_pos=0.0)
    assert not pos.any()
    total, loc_l, conf_l = multibox_loss(
        *map(jnp.asarray, (loc_pred, logits, loc_t, cls_t, pos)), neg_pos_ratio=3.0)
    assert float(loc_l) == 0.0
    assert float(conf_l) > 0.0  # int(3.0) negatives per image contribute


def test_gradients_finite():
    import jax
    rng = np.random.default_rng(3)
    loc_pred, logits, loc_t, cls_t, pos = _random_case(rng)

    def f(lp, lg):
        return multibox_loss(lp, lg, jnp.asarray(loc_t), jnp.asarray(cls_t),
                             jnp.asarray(pos))[0]

    g1, g2 = jax.grad(f, argnums=(0, 1))(jnp.asarray(loc_pred), jnp.asarray(logits))
    assert np.all(np.isfinite(np.asarray(g1)))
    assert np.all(np.isfinite(np.asarray(g2)))
