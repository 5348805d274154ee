"""Inference export transforms.

``fold_batchnorm`` folds trained BatchNorm statistics into the preceding
conv's kernel/bias (the standard serving-time transform):

    y = ((conv(x) - mean) / sqrt(var + eps)) * scale + bias
      = conv'(x) + bias'        with  k' = k * s,  b' = (b - mean) * s + bias,
                                      s = scale / sqrt(var + eps)

The folded parameters load into ``SSD300(..., fold_bn=True)``, whose
ConvBNRelu blocks skip BatchNorm entirely — fewer elementwise passes over
the large early feature maps and no batch_stats collection at serving time.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fold_batchnorm"]

_BN_EPS = 1e-5


def fold_batchnorm(variables: dict, eps: float = _BN_EPS) -> dict:
    """Return ``{"params": ...}`` for the ``fold_bn=True`` model variant.

    ``variables`` must hold {'params', 'batch_stats'} of a standard SSD300.
    Modules without BatchNorm (heads, the BN-free extra convs) pass through.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fold_module(name: str, module: dict) -> dict:
        if "BatchNorm_0" not in module:
            return module
        conv = module["Conv_0"]
        bn = module["BatchNorm_0"]
        mod_stats = stats.get(name, {}).get("BatchNorm_0", {})
        mean = jnp.asarray(mod_stats["mean"])
        var = jnp.asarray(mod_stats["var"])
        s = jnp.asarray(bn["scale"]) / jnp.sqrt(var + eps)
        kernel = jnp.asarray(conv["kernel"]) * s  # [kh, kw, cin, cout] * [cout]
        bias = (jnp.asarray(conv["bias"]) - mean) * s + jnp.asarray(bn["bias"])
        return {"Conv_0": {"kernel": kernel, "bias": bias}}

    folded = {
        name: fold_module(name, mod) if isinstance(mod, dict) else mod
        for name, mod in params.items()
    }
    return {"params": folded}
