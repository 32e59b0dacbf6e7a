"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_device_count() -> int:
    return len(jax.devices())


def build_mesh(data: int = -1, model: int = 1,
               devices: Optional[Sequence] = None) -> Mesh:
    """A 2D ``(data, model)`` mesh. ``data=-1`` absorbs all remaining
    devices. Axis order puts ``model`` innermost so tensor-parallel
    collectives ride the fastest ICI links (scaling-book recipe: closest
    axis ↔ most-frequent collective)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
