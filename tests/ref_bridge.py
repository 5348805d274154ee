"""Bridge between ssdx and the actual reference implementation.

Provides the three pieces needed for golden numerical parity testing against
the real ``mySSD`` (reference SSD_from_scratch.py:14-800):

  1. a ``torchvision`` stub exposing the four ops the reference imports
     (SSD_from_scratch.py:3) — torch 2.x CPU is installed in this
     environment but torchvision is not, so the stub implements
     ``box_convert`` / ``box_iou`` / ``distance_box_iou`` /
     ``complete_box_iou`` with torchvision's published formulas
     (eps=1e-7, upcast semantics);
  2. a deterministic, platform-independent parameter generator keyed by a
     canonical flat naming (numpy ``Philox`` streams, one per tensor) so the
     exact same weights can be loaded into the flax SSD300 and the torch
     ``mySSD`` without shipping 100 MB of weights in the repo;
  3. loaders mapping those canonical arrays into (a) flax
     ``{'params','batch_stats'}`` variables and (b) a torch state_dict
     (HWIO -> OIHW kernel transpose).

The architecture is 23 backbone convs (20 with BatchNorm — the reference
omits BN on conv10_2's 3x3 and all of conv11, SSD_from_scratch.py:193-209)
plus 6 box heads and 6 class heads; construction order is identical on both
sides, so index ``i`` in the canonical naming is the i-th registered conv in
either model.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_DIR = Path("/root/reference")

# (in_channels, out_channels, kernel, has_bn) for the 23 backbone convs, in
# registration order (reference SSD_from_scratch.py:46-209).
BACKBONE_CONVS = [
    (3, 64, 3, True), (64, 64, 3, True),            # conv1
    (64, 128, 3, True), (128, 128, 3, True),        # conv2
    (128, 256, 3, True), (256, 256, 3, True), (256, 256, 3, True),   # conv3
    (256, 512, 3, True), (512, 512, 3, True), (512, 512, 3, True),   # conv4
    (512, 512, 3, True), (512, 512, 3, True), (512, 512, 3, True),   # conv5
    (512, 1024, 3, True),                           # conv6 (dilation 6)
    (1024, 1024, 1, True),                          # conv7
    (1024, 256, 1, True), (256, 512, 3, True),      # conv8
    (512, 128, 1, True), (128, 256, 3, True),       # conv9
    (256, 128, 1, True), (128, 256, 3, False),      # conv10 (no BN on 3x3)
    (256, 128, 1, False), (128, 256, 3, False),     # conv11 (no BN)
]
HEAD_K = (4, 6, 6, 6, 4, 4)
HEAD_IN = (512, 1024, 512, 256, 256, 256)


# ---------------------------------------------------------------------------
# torchvision stub
# ---------------------------------------------------------------------------

def install_torchvision_stub():
    """Install a minimal ``torchvision`` into sys.modules (idempotent).

    Only what ``SSD_from_scratch.py:3-4`` imports: the four box ops and the
    ``torchvision.transforms.v2`` module object (whose attributes are only
    touched inside ``show_prediction_side_by_side``, which parity tests do
    not call).
    """
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]
    import torch

    def _upcast(t):
        return t if t.is_floating_point() else t.float()

    def box_convert(boxes, in_fmt, out_fmt):
        if in_fmt == out_fmt:
            return boxes.clone()
        if in_fmt == "cxcywh" and out_fmt == "xyxy":
            cx, cy, w, h = boxes.unbind(-1)
            return torch.stack(
                [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], dim=-1
            )
        if in_fmt == "xyxy" and out_fmt == "cxcywh":
            x1, y1, x2, y2 = boxes.unbind(-1)
            return torch.stack(
                [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], dim=-1
            )
        raise NotImplementedError(f"{in_fmt} -> {out_fmt}")

    def _area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def box_iou(boxes1, boxes2):
        a1, a2 = _area(_upcast(boxes1)), _area(_upcast(boxes2))
        lt = torch.max(boxes1[:, None, :2], boxes2[:, :2])
        rb = torch.min(boxes1[:, None, 2:], boxes2[:, 2:])
        wh = _upcast(rb - lt).clamp(min=0)
        inter = wh[:, :, 0] * wh[:, :, 1]
        return inter / (a1[:, None] + a2 - inter)

    def _diou_iou(boxes1, boxes2, eps=1e-7):
        iou = box_iou(boxes1, boxes2)
        lti = torch.min(boxes1[:, None, :2], boxes2[:, :2])
        rbi = torch.max(boxes1[:, None, 2:], boxes2[:, 2:])
        whi = _upcast(rbi - lti).clamp(min=0)
        diag2 = whi[:, :, 0] ** 2 + whi[:, :, 1] ** 2 + eps
        xp = (boxes1[:, 0] + boxes1[:, 2]) / 2
        yp = (boxes1[:, 1] + boxes1[:, 3]) / 2
        xg = (boxes2[:, 0] + boxes2[:, 2]) / 2
        yg = (boxes2[:, 1] + boxes2[:, 3]) / 2
        d2 = _upcast(xp[:, None] - xg[None, :]) ** 2 + _upcast(
            yp[:, None] - yg[None, :]
        ) ** 2
        return iou - d2 / diag2, iou

    def distance_box_iou(boxes1, boxes2, eps=1e-7):
        diou, _ = _diou_iou(_upcast(boxes1), _upcast(boxes2), eps)
        return diou

    def complete_box_iou(boxes1, boxes2, eps=1e-7):
        boxes1, boxes2 = _upcast(boxes1), _upcast(boxes2)
        diou, iou = _diou_iou(boxes1, boxes2, eps)
        w_pred = boxes1[:, None, 2] - boxes1[:, None, 0]
        h_pred = boxes1[:, None, 3] - boxes1[:, None, 1]
        w_gt = boxes2[:, 2] - boxes2[:, 0]
        h_gt = boxes2[:, 3] - boxes2[:, 1]
        v = (4 / (torch.pi**2)) * torch.pow(
            torch.atan(w_gt / h_gt) - torch.atan(w_pred / h_pred), 2
        )
        with torch.no_grad():
            alpha = v / (1 - iou + v + eps)
        return diou - alpha * v

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.box_convert = box_convert
    ops.box_iou = box_iou
    ops.distance_box_iou = distance_box_iou
    ops.complete_box_iou = complete_box_iou
    transforms = types.ModuleType("torchvision.transforms")
    v2 = types.ModuleType("torchvision.transforms.v2")
    tv.ops = ops
    tv.transforms = transforms
    transforms.v2 = v2
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.v2"] = v2
    return tv


def load_reference_module():
    """Import the real reference ``SSD_from_scratch`` module (torch needed)."""
    install_torchvision_stub()
    path = REFERENCE_DIR / "SSD_from_scratch.py"
    spec = importlib.util.spec_from_file_location("ref_ssd_from_scratch", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Deterministic parameters
# ---------------------------------------------------------------------------

def make_param_arrays(num_classes: int, seed: int = 724) -> dict[str, np.ndarray]:
    """Canonical named float32 arrays for every parameter of the network.

    Keys: ``conv{i}.w`` (HWIO), ``conv{i}.b``, ``bn{i}.scale/.bias/.mean/.var``
    for backbone conv i (0..22, bn only where present), ``box{i}.w/.b`` and
    ``cls{i}.w/.b`` for the heads.  Each tensor gets its own counter-based
    stream (Philox keyed by (seed, tensor index)) so generation order can
    never drift.  He-scaled weights, unit-ish BN stats keep activations
    numerically tame through all 23 layers in eval mode.
    """
    arrays: dict[str, np.ndarray] = {}
    tidx = 0

    def rng():
        nonlocal tidx
        tidx += 1
        return np.random.Generator(np.random.Philox(key=[seed, tidx]))

    def conv(name, cin, cout, k, scale=1.0):
        g = rng()
        std = scale * np.sqrt(2.0 / (k * k * cin))
        arrays[f"{name}.w"] = g.normal(0, std, (k, k, cin, cout)).astype(np.float32)
        arrays[f"{name}.b"] = g.normal(0, 0.01, (cout,)).astype(np.float32)

    for i, (cin, cout, k, has_bn) in enumerate(BACKBONE_CONVS):
        conv(f"conv{i}", cin, cout, k)
        if has_bn:
            g = rng()
            arrays[f"bn{i}.scale"] = g.uniform(0.8, 1.2, cout).astype(np.float32)
            arrays[f"bn{i}.bias"] = g.normal(0, 0.05, cout).astype(np.float32)
            arrays[f"bn{i}.mean"] = g.normal(0, 0.1, cout).astype(np.float32)
            arrays[f"bn{i}.var"] = g.uniform(0.5, 1.5, cout).astype(np.float32)
    # Heads are damped 10x: with random BN running stats the tap activations
    # run hot, and He-scaled heads would yield near-one-hot softmax scores —
    # useless for threshold/NMS parity.  0.1x gives O(1) logits.
    for i, (cin, kk) in enumerate(zip(HEAD_IN, HEAD_K)):
        conv(f"box{i}", cin, kk * 4, 3, scale=0.1)
        conv(f"cls{i}", cin, kk * num_classes, 3, scale=0.1)
    return arrays


def make_test_inputs(num_classes: int, seed: int = 724) -> dict[str, np.ndarray]:
    """Deterministic inputs for the golden parity suite (regenerated, not
    stored — only the reference's *outputs* live in the golden npz).

    Returns (all float32/int64 numpy):
      images      [2,3,300,300] NCHW standard-normal (normalized-image range)
      gt_boxes    [7,4] normalized xyxy, gt_labels [7] in 0..C-2
      dec_loc     [256,4] offsets for decode parity
      nms_boxes   [96,4] pixel xyxy, nms_scores [96]
      pred_loc    [2,8732,4], pred_conf [2,8732,C] synthetic head outputs:
                  background-boosted logits with ~250 boosted foreground
                  (prior, class) pairs per image so the above-threshold set
                  at score 0.2 is sparse and cap-free on both sides.
    """
    P = 8732

    def g(stream):
        return np.random.Generator(np.random.Philox(key=[seed, 10_000 + stream]))

    out: dict[str, np.ndarray] = {}
    out["images"] = g(0).normal(0, 1, (2, 3, 300, 300)).astype(np.float32)

    gg = g(1)
    centers = gg.uniform(0.1, 0.9, (7, 2))
    sizes = gg.uniform(0.05, 0.4, (7, 2))
    lo = np.clip(centers - sizes / 2, 0.0, 1.0)
    hi = np.clip(centers + sizes / 2, 0.0, 1.0)
    out["gt_boxes"] = np.concatenate([lo, hi], axis=1).astype(np.float32)
    out["gt_labels"] = gg.integers(0, num_classes - 1, 7).astype(np.int64)

    out["dec_loc"] = (g(2).normal(0, 0.7, (256, 4))).astype(np.float32)

    gn = g(3)
    c = gn.uniform(30, 270, (96, 2))
    s = gn.uniform(20, 120, (96, 2))
    out["nms_boxes"] = np.concatenate(
        [np.clip(c - s / 2, 0, 300), np.clip(c + s / 2, 1, 300)], axis=1
    ).astype(np.float32)
    out["nms_scores"] = gn.uniform(0.01, 1.0, 96).astype(np.float32)

    gp = g(4)
    out["pred_loc"] = gp.normal(0, 0.5, (2, P, 4)).astype(np.float32)
    conf = gp.normal(0, 1.0, (2, P, num_classes)).astype(np.float32)
    conf[..., 0] += 4.0
    for b in range(2):
        pairs = gp.choice(P * (num_classes - 1), size=250, replace=False)
        conf[b, pairs // (num_classes - 1), 1 + pairs % (num_classes - 1)] += 7.0
    out["pred_conf"] = conf
    return out


def flax_variables_from_arrays(arrays: dict[str, np.ndarray]):
    """Build SSD300 ``{'params','batch_stats'}`` from canonical arrays."""
    import jax.numpy as jnp

    params: dict = {}
    stats: dict = {}
    for i, (_, _, _, has_bn) in enumerate(BACKBONE_CONVS):
        mod = f"ConvBNRelu_{i}"
        params[mod] = {
            "Conv_0": {
                "kernel": jnp.asarray(arrays[f"conv{i}.w"]),
                "bias": jnp.asarray(arrays[f"conv{i}.b"]),
            }
        }
        if has_bn:
            params[mod]["BatchNorm_0"] = {
                "scale": jnp.asarray(arrays[f"bn{i}.scale"]),
                "bias": jnp.asarray(arrays[f"bn{i}.bias"]),
            }
            stats[mod] = {
                "BatchNorm_0": {
                    "mean": jnp.asarray(arrays[f"bn{i}.mean"]),
                    "var": jnp.asarray(arrays[f"bn{i}.var"]),
                }
            }
    for i in range(6):
        params[f"box_head_{i}"] = {
            "kernel": jnp.asarray(arrays[f"box{i}.w"]),
            "bias": jnp.asarray(arrays[f"box{i}.b"]),
        }
        params[f"cls_head_{i}"] = {
            "kernel": jnp.asarray(arrays[f"cls{i}.w"]),
            "bias": jnp.asarray(arrays[f"cls{i}.b"]),
        }
    return {"params": params, "batch_stats": stats}


def torch_model_from_arrays(arrays: dict[str, np.ndarray], class_to_idx: dict):
    """Build the reference ``mySSD`` with the canonical arrays loaded."""
    import torch

    ref = load_reference_module()
    model = ref.mySSD(class_to_idx)
    model.eval()

    convs = [m for m in model.modules() if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in model.modules() if isinstance(m, torch.nn.BatchNorm2d)]
    n_backbone = len(BACKBONE_CONVS)
    assert len(convs) == n_backbone + 12, len(convs)
    assert len(bns) == sum(1 for c in BACKBONE_CONVS if c[3]), len(bns)

    def put_conv(m, name):
        w = arrays[f"{name}.w"].transpose(3, 2, 0, 1)  # HWIO -> OIHW
        m.weight.data = torch.from_numpy(np.ascontiguousarray(w))
        m.bias.data = torch.from_numpy(arrays[f"{name}.b"].copy())

    bn_i = 0
    for i, (_, _, _, has_bn) in enumerate(BACKBONE_CONVS):
        put_conv(convs[i], f"conv{i}")
        if has_bn:
            m = bns[bn_i]
            m.weight.data = torch.from_numpy(arrays[f"bn{i}.scale"].copy())
            m.bias.data = torch.from_numpy(arrays[f"bn{i}.bias"].copy())
            m.running_mean.data = torch.from_numpy(arrays[f"bn{i}.mean"].copy())
            m.running_var.data = torch.from_numpy(arrays[f"bn{i}.var"].copy())
            bn_i += 1
    # torch registration order: 23 backbone, then box_head 0-5, then cls_head
    # 0-5 (reference SSD_from_scratch.py:213-229).
    for i in range(6):
        put_conv(convs[n_backbone + i], f"box{i}")
        put_conv(convs[n_backbone + 6 + i], f"cls{i}")
    return model
