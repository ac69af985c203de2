from .config import RenderConfig
from .image import save_png, framebuffer_to_array
from .timing import time_fn, rays_per_image
from .checkpoint import save_pytree, load_pytree
from .metrics import MetricsLogger
