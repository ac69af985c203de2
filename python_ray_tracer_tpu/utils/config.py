"""Render configuration.

The reference has no config system — every knob is a hard-coded local in its driver
(main.py:10-12: ``w, h``, ``amb, lamb, refl, refl_depth``, ``aliasing``; camera pose
main.py:24; fov camera.py:8). This dataclass is that implicit config surface made
explicit, plus the TPU-specific knobs (compat mode, backend selection, sharding).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class RenderConfig:
    width: int = 1000
    height: int = 1000
    ambient: float = 0.0
    lambert: float = 0.6
    reflection: float = 0.3
    depth: int = 2
    aliasing: bool = True
    fov: float = 45.0
    camera_position: Tuple[float, float, float] = (-2.0, 0.0, 2.0)
    camera_euler: Tuple[float, float, float] = (0.0, -30.0, 0.0)
    # TPU-build knobs (no reference analogue):
    compat: bool = True            # reproduce reference quirks bit-for-bit
    # "auto" resolves per device: the fused Mosaic kernels on a TPU, the
    # XLA-fused jnp path elsewhere (Mosaic requires TPU hardware; interpret
    # mode is a test facility, not a CPU backend). See resolve_backend.
    backend: str = "auto"          # "auto" | "jnp" | "pallas"
    row_chunk: Optional[int] = None
    specular: float = 0.0          # Phong highlight (clean mode only)
    shininess: float = 32.0

    @staticmethod
    def reference_defaults() -> "RenderConfig":
        """The reference driver's exact settings (main.py:10-12, 24)."""
        return RenderConfig()


def resolve_backend(backend: str) -> str:
    """Resolve ``"auto"`` to the fastest backend for the attached device.

    On a TPU the quick-start path should hit the fused Pallas kernel (the
    ~35x-faster forward); everywhere else the jnp/XLA path is the only one
    that runs. Explicit choices pass through untouched.
    """
    if backend != "auto":
        return backend
    import jax

    return "pallas" if jax.devices()[0].platform == "tpu" else "jnp"
