"""montecarlopathtracing_tpu — a TPU-native differentiable Monte Carlo path
tracer in JAX, built from scratch with the capabilities of the reference
C++ CPU tracer Arieys/MonteCarloPathTracing (see SURVEY.md for the layer map).

Quick start:

    from montecarlopathtracing_tpu import render_scene, RenderOptions
    img, path = render_scene("scene", "cornell-box", spp=25)
"""

from .api import load_scene, render, render_progressive, render_scene
from .accel.lbvh import BVHArrays, build_lbvh, build_lbvh_host
from .config import MODERN, CompatOptions, RenderOptions
from .film.film import Film, tonemap, write_png
from .integrator.wavefront import render_image, render_pixels, trace_paths
from .scene.types import CameraArrays, SceneArrays, SceneMeta

__version__ = "0.1.0"

__all__ = [
    "BVHArrays", "CameraArrays", "CompatOptions", "Film", "MODERN",
    "RenderOptions", "SceneArrays", "SceneMeta", "build_lbvh",
    "build_lbvh_host", "load_scene",
    "render", "render_image", "render_pixels", "render_progressive",
    "render_scene", "tonemap", "trace_paths", "write_png",
]
