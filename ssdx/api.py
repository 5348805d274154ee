"""High-level detector API: the user-facing surface of the reference's
``mySSD`` object (SSD_from_scratch.py:14-36, 338-476) on top of the
functional core.

A :class:`Detector` owns the model definition, parameters/batch-stats, the
prior constants, and a cache of jitted inference functions; ``predict``
mirrors the reference signature and ragged output contract exactly
(labels 0-based foreground ids, scores, boxes xyxy in 300x300 coords),
including the ``pre_loc_all``/``pre_conf_all`` logit-reuse path used by the
eval step (SSD_trainer.py:250-256).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import priors as P
from .model import IMAGE_SIZE, SSD300
from .predict import Detections, postprocess, to_pylist

__all__ = ["Detector"]


class Detector:
    """SSD300 detector with a stable user API.

    class_to_idx maps foreground class names to 0-based ids (alphabetical in
    the reference datasets); background is handled internally as logit
    column 0 (num_classes = len(class_to_idx) + 1, SSD_from_scratch.py:25).
    """

    def __init__(
        self,
        class_to_idx: dict[str, int],
        variances: tuple[float, float] = (0.1, 0.2),
        dtype: Any = jnp.float32,
        variables: dict | None = None,
        rng_seed: int = 0,
        fold_bn: bool = False,
        stem_kernel: bool = False,
    ):
        self.class_to_idx = dict(class_to_idx)
        self.idx_to_class = {v: k for k, v in class_to_idx.items()}
        self.num_classes = len(class_to_idx) + 1
        self.variances = tuple(variances)
        self.img_h = self.img_w = IMAGE_SIZE

        self.model = SSD300(num_classes=self.num_classes, dtype=dtype, fold_bn=fold_bn)
        if variables is None:
            base = SSD300(num_classes=self.num_classes, dtype=dtype)
            variables = base.init_variables(jax.random.key(rng_seed))
        if fold_bn and "batch_stats" in variables:
            from .export import fold_batchnorm

            variables = fold_batchnorm(variables)
        self.variables = variables

        pri = P.create_priors()
        self.priors = jnp.asarray(pri)
        self.priors_xyxy = jnp.asarray(P.priors_xyxy(pri))

        # Optional fused Pallas stem (conv1 block + maxpool in one kernel;
        # ssdx/ops/pallas_stem.py).  Requires folded-BN params.
        self.stem_kernel = bool(stem_kernel and fold_bn)
        if self.stem_kernel:
            from .ops.pallas_stem import stem_conv_pool

            rest = SSD300(
                num_classes=self.num_classes, dtype=dtype, fold_bn=True,
                stem_input=True,
            )

            def _fwd(variables, images):
                feats = stem_conv_pool(
                    images, variables["params"], compute_dtype=dtype
                )
                return rest.apply(variables, feats, train=False)

            self._forward = jax.jit(_fwd)
        else:
            self._forward = jax.jit(
                lambda variables, images: self.model.apply(variables, images, train=False)
            )

    # ---- weights ----

    @classmethod
    def from_weights(cls, path, class_to_idx, fold_bn: bool = True, **kwargs) -> "Detector":
        """Load a weights-only export (ssdx.train.checkpoint.save_params) —
        the analog of the app's bare state_dict load (ssd_demo_app.py:32-36).

        ``fold_bn`` (default True) folds BatchNorm statistics into the conv
        weights at load time — the standard serving-time transform (the
        reference app runs eval-mode BN, ssd_demo_app.py:32-36; folding is
        the equivalent with the elementwise pass removed entirely).
        """
        from .train.checkpoint import load_params

        blob = load_params(path)
        variables = {"params": blob["params"], "batch_stats": blob["batch_stats"]}
        return cls(class_to_idx, variables=variables, fold_bn=fold_bn, **kwargs)

    def load_train_state(self, state) -> None:
        """Adopt params/batch_stats from a TrainState."""
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if self.model.fold_bn:
            from .export import fold_batchnorm

            variables = fold_batchnorm(variables)
        self.variables = variables

    # ---- inference ----

    def forward(self, images) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Raw heads: images [B,300,300,3] (normalized, NHWC) ->
        (loc [B,P,4], cls [B,P,C])."""
        return self._forward(self.variables, jnp.asarray(images))

    def predict_batched(
        self,
        images=None,
        score_thresh: float = 0.2,
        nms_thresh: float = 0.5,
        max_per_img: int = 100,
        class_agnostic: bool = False,
        pre_loc_all=None,
        pre_conf_all=None,
    ) -> Detections:
        """Fixed-shape padded detections (device arrays)."""
        if pre_loc_all is not None and pre_conf_all is not None:
            loc, conf = jnp.asarray(pre_loc_all), jnp.asarray(pre_conf_all)
        else:
            if images is None:
                raise ValueError("either images or precomputed logits required")
            loc, conf = self.forward(images)
        return postprocess(
            loc,
            conf,
            self.priors,
            score_thresh=score_thresh,
            nms_thresh=nms_thresh,
            max_per_img=max_per_img,
            class_agnostic=class_agnostic,
            variances=self.variances,
        )

    def predict(self, images=None, **kwargs) -> list[dict]:
        """Reference-contract ragged predictions: list (len B) of
        {'labels' int64 0..C-2, 'scores' float32, 'boxes' [K,4] xyxy in
        300x300 pixel coords} (SSD_from_scratch.py:359-364)."""
        return to_pylist(self.predict_batched(images=images, **kwargs))

    # ---- single-image convenience (serving path) ----

    def preprocess_pil(self, pil_img) -> np.ndarray:
        """EXIF-transpose + resize(300,300, antialias) + ImageNet normalize
        (SSD_from_scratch.py:544-563); returns [1,300,300,3] float32."""
        from PIL import Image, ImageOps

        pil_img = ImageOps.exif_transpose(pil_img.convert("RGB"))
        pil_img = pil_img.resize((IMAGE_SIZE, IMAGE_SIZE), Image.BILINEAR)
        arr = np.asarray(pil_img, np.float32) / 255.0
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        return ((arr - mean) / std)[None]

    def predict_pil(self, pil_img, **kwargs) -> dict:
        """Predict on one PIL image; returns a single ragged dict."""
        return self.predict(self.preprocess_pil(pil_img), **kwargs)[0]
