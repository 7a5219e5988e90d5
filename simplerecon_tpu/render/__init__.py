"""Headless mesh rendering (native C++ rasterizer)."""

from simplerecon_tpu.render.renderer import Renderer, SmoothBirdsEyeCamera

__all__ = ["Renderer", "SmoothBirdsEyeCamera"]
