import jax
import jax.numpy as jnp
import numpy as np

from ssdx.export import fold_batchnorm
from ssdx.model import SSD300


def test_fold_batchnorm_matches_eval_forward():
    model = SSD300(num_classes=6, width_mult=0.25)
    variables = model.init_variables(jax.random.key(0))
    # make BN stats non-trivial (fresh init has mean=0, var=1)
    variables = jax.tree.map(lambda x: x, variables)
    x = jax.random.normal(jax.random.key(1), (2, 300, 300, 3))
    # run a train-mode pass to move the running stats off their init values
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}

    loc_ref, cls_ref = model.apply(variables, x, train=False)

    folded = fold_batchnorm(variables)
    folded_model = SSD300(num_classes=6, fold_bn=True, width_mult=0.25)
    loc_f, cls_f = folded_model.apply(folded, x, train=False)

    np.testing.assert_allclose(np.asarray(loc_f), np.asarray(loc_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(cls_f), np.asarray(cls_ref),
                               atol=2e-3)


def test_folded_param_tree_has_no_bn():
    model = SSD300(num_classes=6, width_mult=0.25)
    variables = model.init_variables(jax.random.key(0))
    folded = fold_batchnorm(variables)
    flat = jax.tree_util.tree_flatten_with_path(folded)[0]
    assert not any("BatchNorm" in jax.tree_util.keystr(p) for p, _ in flat)
    # folded variant initializes with the same tree structure
    fm = SSD300(num_classes=6, fold_bn=True, width_mult=0.25)
    ref = fm.init_variables(jax.random.key(0))
    assert jax.tree.structure(ref["params"]) == jax.tree.structure(folded["params"])
