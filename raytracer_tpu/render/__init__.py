from .renderer import Renderer, render  # noqa: F401
