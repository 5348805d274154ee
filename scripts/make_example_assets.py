#!/usr/bin/env python
"""Generate the bundled demo-app example images (ssdx/serve/static/).

The reference app ships a populated /examples gallery (ssd_demo_app.py:
216-276) of street-scene photos.  This environment has no dataset, so the
bundled examples are SynthDrive scenes from the shared renderer
``ssdx.data.synth.render_scene`` — the SAME distribution the bundled demo
weights are trained on (scripts/make_demo_weights.py), so the app detects
objects in its own gallery out of the box.  Re-run to regenerate
deterministically.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from ssdx.data.synth import render_scene  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "ssdx" / "serve" / "static"


def main() -> None:
    from PIL import Image

    OUT.mkdir(parents=True, exist_ok=True)
    for i, seed in enumerate((11, 29, 47), start=1):
        p = OUT / f"example_{i}.jpg"
        # draw until the scene has at least two labeled objects
        rng = np.random.default_rng(seed)
        while True:
            img, boxes, _ = render_scene(rng)
            if len(boxes) >= 2:
                break
        Image.fromarray(img).save(p, quality=88)
        print(f"wrote {p} ({len(boxes)} objects)")


if __name__ == "__main__":
    main()
