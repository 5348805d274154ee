#!/usr/bin/env python
"""Generate the bundled demo-app example images (ssdx/serve/static/).

The reference app ships a populated /examples gallery (ssd_demo_app.py:
216-276) of street-scene photos.  This environment has no dataset, so the
bundled examples are procedurally drawn street scenes (sky, road, vehicles,
traffic light) — enough to exercise the upload -> side-by-side pipeline and
populate the gallery.  Re-run this script to regenerate deterministically.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

OUT = Path(__file__).resolve().parent.parent / "ssdx" / "serve" / "static"


def _scene(seed: int, size: int = 512) -> Image.Image:
    rng = np.random.default_rng(seed)
    img = Image.new("RGB", (size, size))
    d = ImageDraw.Draw(img)
    horizon = int(size * 0.45)
    # sky gradient
    for y in range(horizon):
        t = y / horizon
        d.line([(0, y), (size, y)], fill=(int(120 + 80 * t), int(170 + 40 * t), 235))
    # road
    d.rectangle([0, horizon, size, size], fill=(78, 78, 84))
    d.polygon([(size * 0.45, horizon), (size * 0.55, horizon),
               (size * 0.75, size), (size * 0.25, size)], fill=(95, 95, 100))
    # lane dashes
    for i in range(6):
        y0 = horizon + 20 + i * 80
        d.rectangle([size * 0.49, y0, size * 0.51, y0 + 40], fill=(230, 225, 120))
    # vehicles
    for _ in range(int(rng.integers(2, 5))):
        w = int(rng.integers(60, 140))
        h = int(w * rng.uniform(0.55, 0.8))
        x = int(rng.integers(0, size - w))
        y = int(rng.integers(horizon, size - h))
        body = tuple(int(c) for c in rng.integers(40, 220, 3))
        d.rectangle([x, y, x + w, y + h], fill=body, outline=(20, 20, 20), width=3)
        d.rectangle([x + w * 0.15, y - h * 0.35, x + w * 0.85, y],
                    fill=tuple(max(0, c - 30) for c in body), outline=(20, 20, 20), width=2)
        for cx in (x + w * 0.22, x + w * 0.78):
            r = h * 0.22
            d.ellipse([cx - r, y + h - r, cx + r, y + h + r], fill=(15, 15, 15))
    # traffic light
    px = int(rng.integers(int(size * 0.05), int(size * 0.9)))
    d.rectangle([px, horizon - 170, px + 10, horizon], fill=(40, 40, 40))
    d.rectangle([px - 12, horizon - 230, px + 22, horizon - 160], fill=(30, 30, 30))
    for j, col in enumerate([(220, 40, 40), (230, 200, 40), (60, 200, 70)]):
        cy = horizon - 222 + j * 22
        d.ellipse([px - 4, cy, px + 14, cy + 18], fill=col)
    return img


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for i, seed in enumerate((11, 29, 47), start=1):
        p = OUT / f"example_{i}.jpg"
        _scene(seed).save(p, quality=88)
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
