"""Deterministic synthetic cherry-wood texture (the real asset referenced by
cornell-box.mtl's map_Kd is not shipped with the reference repo)."""
import sys

import numpy as np
from PIL import Image

rng = np.random.default_rng(12345)
h, w = 256, 256
y = np.linspace(0, 8 * np.pi, h)[:, None]
x = np.linspace(0, 3 * np.pi, w)[None, :]
grain = 0.5 + 0.35 * np.sin(x * 2 + 3 * np.sin(y * 0.5)) \
    + 0.15 * rng.standard_normal((h, w))
grain = np.clip(grain, 0, 1)
rgb = np.stack([0.55 + 0.3 * grain, 0.25 + 0.2 * grain, 0.12 + 0.1 * grain],
               axis=-1)
img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
Image.fromarray(img).save(sys.argv[1] if len(sys.argv) > 1
                          else "cherry-wood-texture.jpg", quality=92)
