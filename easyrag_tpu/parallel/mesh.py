"""Device mesh construction.

The reference is single-process/single-GPU (SURVEY.md §2: no distributed
strategies); scaling here is a new TPU-first design: corpora beyond one
chip's HBM shard over an ICI mesh axis ("data"), and the 7B embedder can
shard tensor-parallel over a second axis ("model"). A 1-device mesh is the
degenerate case, so the single-chip path is the same code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = [len(devices)]
        axis_names = (axis_names[0],) if axis_names else ("data",)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    mesh_devices = np.asarray(devices[:n]).reshape(shape)
    return Mesh(mesh_devices, tuple(axis_names))


def data_model_mesh(n_devices: int, model_parallel: int = 1, devices=None) -> Mesh:
    """(data, model) mesh: dp shards the corpus/index, mp shards weights."""
    if n_devices % model_parallel:
        raise ValueError(f"{n_devices} devices not divisible by mp={model_parallel}")
    return make_mesh(
        [n_devices // model_parallel, model_parallel], ("data", "model"), devices
    )
