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
        mesh=None,
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

        else:

            def _fwd(variables, images):
                return self.model.apply(variables, images, train=False)

        self.mesh = mesh
        self._install_forward(_fwd)

    def _install_forward(self, _fwd) -> None:
        """Jit (and, with a mesh, shard_map) the raw forward.

        Data-parallel inference: with a mesh the forward runs under
        shard_map over the ``data`` axis (each device computes its batch
        shard independently — SSD inference has no cross-device
        communication, so this also lets the Pallas stem kernel run
        per-shard without GSPMD having to partition a custom call).
        Postprocess then runs on the sharded logits; every op in it is
        batch-elementwise, so GSPMD keeps the batch axis sharded for free.
        """
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as PS

            from .mesh import DATA_AXIS, replicated

            sharded = jax.shard_map(
                _fwd,
                mesh=self.mesh,
                in_specs=(PS(), PS(DATA_AXIS)),
                out_specs=PS(DATA_AXIS),
                check_vma=False,
            )
            self._forward = jax.jit(sharded)
            self.variables = jax.device_put(self.variables, replicated(self.mesh))
        else:
            self._forward = jax.jit(_fwd)

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

    # ---- int8 quantized serving (ssdx/quant.py) ----

    def quantize_int8(
        self, calib_images, calib_batch: int = 16, backend: str = "auto"
    ) -> dict:
        """Switch this detector's forward to the int8-quantized backbone
        (symmetric int8, per-output-channel weight scales, per-input-channel
        activation scales folded into the weights — see ssdx/quant.py).  The
        stem stays bf16 (Pallas kernel on TPU), the multibox heads stay bf16.

        ``calib_images``: representative normalized images [N,300,300,3]
        (N >= 1) used to calibrate activation scales; processed in chunks of
        ``calib_batch``.  Returns the calibrated per-layer amax[cin] dict.

        ``backend``: "pallas" runs the int8 convs as Pallas MXU kernels
        (ssdx/ops/pallas_int8_conv.py — the fast path; plain XLA lowers
        int8 convs to ~1000x-slower scalar VPU code), "xla" keeps the
        lax.conv formulation (CPU/tests), "auto" picks by platform.

        The reference has no quantized serving mode; this is the TPU-native
        production-serving extension (int8 MXU rate is 2x bf16 on v5e).
        """
        import numpy as np

        from . import quant

        if not self.model.fold_bn:
            raise ValueError("int8 quantization requires fold_bn=True")
        dtype = self.model.dtype
        params = self.variables["params"]

        if self.stem_kernel:
            from .ops.pallas_stem import stem_conv_pool

            def stem(variables, images):
                return stem_conv_pool(
                    images, variables["params"], compute_dtype=dtype
                )

        else:

            def stem(variables, images):
                return quant.stem_bf16(variables["params"], images, dtype)

        stem_j = jax.jit(stem)
        calib_images = np.asarray(calib_images)
        scales: dict[str, np.ndarray] = {}
        for i in range(0, calib_images.shape[0], calib_batch):
            feats = stem_j(self.variables, jnp.asarray(calib_images[i : i + calib_batch]))
            for k, v in quant.calibrate_act_scales(params, feats, dtype).items():
                scales[k] = np.maximum(scales[k], v) if k in scales else v
        self.quant_params = quant.quantize_ssd(params, scales, self.num_classes)
        qp = self.quant_params
        if backend == "auto":
            backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
        if backend == "pallas":
            from .ops.pallas_int8_conv import apply_int8_pallas

            def _fwd(variables, images):
                return apply_int8_pallas(qp, stem(variables, images), dtype)

        else:

            def _fwd(variables, images):
                return quant.apply_int8(qp, stem(variables, images), dtype)

        self._install_forward(_fwd)
        return scales

    # ---- inference ----

    def forward(self, images) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Raw heads: images [B,300,300,3] (normalized, NHWC) ->
        (loc [B,P,4], cls [B,P,C]).

        With a mesh, the batch is zero-padded up to a multiple of the mesh
        size (shard_map needs an evenly divisible leading axis) and the pad
        rows are dropped from the outputs."""
        images = jnp.asarray(images)
        if self.mesh is None:
            return self._forward(self.variables, images)

        from .mesh import batch_sharding

        n = self.mesh.devices.size
        b = images.shape[0]
        pad = (-b) % n
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad, *images.shape[1:]), images.dtype)]
            )
        images = jax.device_put(images, batch_sharding(self.mesh))
        loc, conf = self._forward(self.variables, images)
        return (loc[:b], conf[:b]) if pad else (loc, conf)

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
