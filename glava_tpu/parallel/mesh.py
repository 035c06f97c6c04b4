"""Mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices=None, *, streams: int | None = None, rows: int | None = None
) -> Mesh:
    """Build a ('streams', 'rows') mesh over the given devices.

    Defaults: all devices on the streams axis (pure data parallelism
    over audio streams). Pass ``rows`` to carve a spatial axis for
    sharding large frames.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if streams is None and rows is None:
        streams, rows = n, 1
    elif streams is None:
        if rows <= 0 or n % rows or n < rows:
            raise ValueError(
                f"need a device count divisible by rows={rows}, got {n} "
                f"device(s); provision more devices or lower rows"
            )
        streams = n // rows
    elif rows is None:
        if streams <= 0 or n % streams or n < streams:
            raise ValueError(
                f"need a device count divisible by streams={streams}, got "
                f"{n} device(s); provision more devices or lower streams"
            )
        rows = n // streams
    if streams * rows != n:
        raise ValueError(
            f"mesh streams={streams} x rows={rows} needs {streams * rows} "
            f"devices but {n} are available"
        )
    return Mesh(devices.reshape(streams, rows), ("streams", "rows"))


def stream_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-stream arrays."""
    return NamedSharding(mesh, P("streams"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """(S, H, W, 4) frames: streams x rows."""
    return NamedSharding(mesh, P("streams", "rows"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
