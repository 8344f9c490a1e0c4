"""Film: accumulation state, tone map, PNG I/O.

Reference: ``image`` buffer (``MTPC/sceneManagement.h:216-253``), driver tone
map ``clamp(c*255, 0, 255)`` per channel with NO gamma (``MTPC/MTPC.cpp:26-28``,
quirk #11), vendored uncompressed-PNG writer svpng (``MTPC/svpng.inc:77``)
replaced by PIL.  Output naming parity: ``<scene>-SPP<k>.png``.

The accumulation state is (radiance_sum, n_samples) so progressive SPP,
checkpoint/resume, and multi-chip psum-merge are all the same operation
(SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Film:
    """Progressive accumulation state. radiance_sum is SUM over samples (not
    mean) so two Films merge by simple addition."""

    radiance_sum: Any  # (H,W,3) f32
    n_samples: Any  # () f32

    @staticmethod
    def zeros(height: int, width: int) -> "Film":
        return Film(jnp.zeros((height, width, 3), jnp.float32), jnp.float32(0))

    def add(self, radiance_mean, n: float) -> "Film":
        """Fold in a render that averaged ``n`` samples."""
        return Film(self.radiance_sum + radiance_mean * n, self.n_samples + n)

    def merge(self, other: "Film") -> "Film":
        return Film(self.radiance_sum + other.radiance_sum, self.n_samples + other.n_samples)

    @property
    def mean(self):
        return self.radiance_sum / jnp.maximum(self.n_samples, 1.0)


def tonemap(radiance, gamma: bool = False):
    """Radiance -> uint8. Compat default: clamp(c*255), no gamma (quirk #11)."""
    c = jnp.asarray(radiance)
    if gamma:
        c = jnp.power(jnp.clip(c, 0.0, 1.0), 1.0 / 2.2)
    return jnp.clip(c * 255.0, 0.0, 255.0).astype(jnp.uint8)


def write_png(path: str, rgb_u8) -> str:
    from PIL import Image

    arr = np.asarray(rgb_u8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr, mode="RGB").save(path)
    return path


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def output_name(out_dir: str, scene_name: str, spp: int) -> str:
    """`<scene>-SPP<k>.png` (imshow, MTPC/MTPC.cpp:20)."""
    return os.path.join(out_dir, f"{scene_name}-SPP{spp}.png")


def save_checkpoint(path: str, film: Film) -> None:
    np.savez(path, radiance_sum=np.asarray(film.radiance_sum),
             n_samples=np.asarray(film.n_samples))


def load_checkpoint(path: str) -> Film:
    z = np.load(path)
    return Film(jnp.asarray(z["radiance_sum"]), jnp.asarray(z["n_samples"]))
