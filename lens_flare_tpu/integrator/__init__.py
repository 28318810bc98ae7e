from .path import render_wavefront, RenderSettings  # noqa: F401
