"""Typing aliases (reference scene/common.py:5-6 parity)."""
from typing import List, Sequence, Tuple, Union

import jax
import numpy as np

Vector3D = Union[jax.Array, np.ndarray, list, Tuple[float, float, float]]
Color = Union[List[int], Tuple[int, int, int], Sequence[float]]
