"""Procedural street-scene generator with ground-truth boxes.

The offline environment has no real dataset, so the demo app's bundled
example images (ssdx/serve/static/, scripts/make_example_assets.py) and the
bundled demo weights (scripts/make_demo_weights.py) are both drawn from THIS
generator: a model trained on ``draw_scene`` outputs detects the objects in
the bundled examples, giving the app meaningful out-of-the-box predictions
(the reference app ships real trained weights, ssd_demo_app.py:32-36 —
this is the closest honest equivalent without the Udacity data).

Scenes contain the deployment class vocabulary (CLASS_TO_IDX):
cars, trucks (taller cargo box), pedestrians (head + body), bikers
(wheels + rider), and one traffic light.
"""
from __future__ import annotations

import numpy as np

__all__ = ["draw_scene", "CLASSES"]

CLASSES = ("biker", "car", "pedestrian", "trafficLight", "truck")


def draw_scene(seed: int, size: int = 512):
    """Returns (PIL.Image RGB, boxes xyxy float32 [n,4], labels list[str])."""
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(seed)
    img = Image.new("RGB", (size, size))
    d = ImageDraw.Draw(img)
    boxes: list[list[float]] = []
    labels: list[str] = []
    horizon = int(size * 0.45)

    # sky gradient
    for y in range(horizon):
        t = y / horizon
        d.line([(0, y), (size, y)], fill=(int(120 + 80 * t), int(170 + 40 * t), 235))
    # road
    d.rectangle([0, horizon, size, size], fill=(78, 78, 84))
    d.polygon([(size * 0.45, horizon), (size * 0.55, horizon),
               (size * 0.75, size), (size * 0.25, size)], fill=(95, 95, 100))
    for i in range(6):
        y0 = horizon + 20 + i * 80
        d.rectangle([size * 0.49, y0, size * 0.51, y0 + 40], fill=(230, 225, 120))

    def vehicle(kind: str):
        w = int(rng.integers(60, 140))
        h = int(w * rng.uniform(0.55, 0.8))
        x = int(rng.integers(0, size - w))
        y = int(rng.integers(horizon, max(horizon + 1, size - h)))
        body = tuple(int(c) for c in rng.integers(40, 220, 3))
        cab_h = h * (0.75 if kind == "truck" else 0.35)
        d.rectangle([x, y, x + w, y + h], fill=body, outline=(20, 20, 20), width=3)
        d.rectangle([x + w * 0.15, y - cab_h, x + w * 0.85, y],
                    fill=tuple(max(0, c - 30) for c in body),
                    outline=(20, 20, 20), width=2)
        for cx in (x + w * 0.22, x + w * 0.78):
            r = h * 0.22
            d.ellipse([cx - r, y + h - r, cx + r, y + h + r], fill=(15, 15, 15))
        boxes.append([x, y - cab_h, x + w, y + h + h * 0.22])
        labels.append(kind)

    def pedestrian():
        h = int(rng.integers(40, 80))
        w = int(h * 0.35)
        x = int(rng.integers(0, size - w))
        y = int(rng.integers(horizon, max(horizon + 1, size - h)))
        skin = (224, 187, 158)
        coat = tuple(int(c) for c in rng.integers(30, 200, 3))
        r = w * 0.45
        d.ellipse([x + w / 2 - r, y, x + w / 2 + r, y + 2 * r], fill=skin)
        d.rectangle([x, y + 2 * r, x + w, y + h * 0.7], fill=coat)
        d.rectangle([x + w * 0.1, y + h * 0.7, x + w * 0.45, y + h], fill=(40, 40, 60))
        d.rectangle([x + w * 0.55, y + h * 0.7, x + w * 0.9, y + h], fill=(40, 40, 60))
        boxes.append([x, y, x + w, y + h])
        labels.append("pedestrian")

    def biker():
        h = int(rng.integers(45, 75))
        w = int(h * 1.1)
        x = int(rng.integers(0, size - w))
        y = int(rng.integers(horizon, max(horizon + 1, size - h)))
        r = h * 0.28
        frame = tuple(int(c) for c in rng.integers(100, 250, 3))
        for cx in (x + r, x + w - r):
            d.ellipse([cx - r, y + h - 2 * r, cx + r, y + h], outline=(10, 10, 10),
                      width=4)
        d.line([x + r, y + h - r, x + w / 2, y + h * 0.45, x + w - r, y + h - r],
               fill=frame, width=5)
        d.ellipse([x + w / 2 - r * 0.5, y, x + w / 2 + r * 0.5, y + r], fill=(224, 187, 158))
        d.rectangle([x + w / 2 - r * 0.4, y + r, x + w / 2 + r * 0.4, y + h * 0.55],
                    fill=frame)
        boxes.append([x, y, x + w, y + h])
        labels.append("biker")

    makers = {"car": lambda: vehicle("car"), "truck": lambda: vehicle("truck"),
              "pedestrian": pedestrian, "biker": biker}
    names = list(makers)
    for _ in range(int(rng.integers(2, 6))):
        makers[names[rng.integers(0, len(names))]]()

    # traffic light
    px = int(rng.integers(int(size * 0.05), int(size * 0.9)))
    d.rectangle([px, horizon - 170, px + 10, horizon], fill=(40, 40, 40))
    d.rectangle([px - 12, horizon - 230, px + 22, horizon - 160], fill=(30, 30, 30))
    for j, col in enumerate([(220, 40, 40), (230, 200, 40), (60, 200, 70)]):
        cy = horizon - 222 + j * 22
        d.ellipse([px - 4, cy, px + 14, cy + 18], fill=col)
    boxes.append([px - 12, horizon - 230, px + 22, horizon - 160])
    labels.append("trafficLight")

    b = np.asarray(boxes, np.float32)
    b = np.clip(b, 0, size)
    return img, b, labels
