"""Mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices=None, *, streams: int | None = None, rows: int | None = None,
    hosts: int | None = None
) -> Mesh:
    """Build a ('streams', 'rows') mesh over the given devices — or,
    with ``hosts``, a ('hosts', 'streams', 'rows') mesh whose OUTER
    axis maps across hosts so its traffic rides DCN.

    Defaults: all devices on the streams axis (pure data parallelism
    over audio streams). Pass ``rows`` to carve a spatial axis for
    sharding large frames. The multi-host recipe (scaling-book
    ordering: DP outermost over DCN, everything communicating over
    ICI inside a host): streams shard over ('hosts', 'streams') —
    streams are independent, so a correctly sharded step compiles to
    ZERO cross-host collectives (pinned by dryrun_multichip §4) —
    while 'rows' spatial sharding stays host-internal.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if hosts is not None:
        if hosts <= 0 or n % hosts:
            raise ValueError(
                f"need a device count divisible by hosts={hosts}, got {n}")
        per = n // hosts
        rows = rows or 1
        if per % rows:
            raise ValueError(
                f"per-host device count {per} not divisible by rows={rows}")
        streams = streams or per // rows
        if hosts * streams * rows != n:
            raise ValueError(
                f"mesh hosts={hosts} x streams={streams} x rows={rows} "
                f"needs {hosts * streams * rows} devices but {n} are "
                f"available")
        return Mesh(devices.reshape(hosts, streams, rows),
                    ("hosts", "streams", "rows"))
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


def stream_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes the stream (data-parallel) dimension shards over —
    ('hosts', 'streams') on a multi-host mesh, else ('streams',)."""
    return tuple(a for a in mesh.axis_names if a in ("hosts", "streams"))


def stream_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-stream arrays."""
    return NamedSharding(mesh, P(stream_axes(mesh)))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """(S, H, W, 4) frames: streams x rows."""
    return NamedSharding(mesh, P(stream_axes(mesh), "rows"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
