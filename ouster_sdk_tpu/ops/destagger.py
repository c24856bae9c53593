"""Destagger / stagger: per-row circular shifts aligning columns in time vs
azimuth.

Rebuild of the reference destagger (ref: ouster_client/include/ouster/impl/
lidar_scan_impl.h:764-847, python data.py:103-126). The reference memcpy-
rotates each row; here it is a single gather with a per-row index map —
one fused XLA op on device, and numpy take_along_axis on host.

Semantics: destaggered[u, j] = staggered[u, (j - shift[u]) mod w]
(shift sign +1; inverse flips the sign).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np

from ..core.types import SensorInfo


def _shifts(info_or_shifts) -> np.ndarray:
    if isinstance(info_or_shifts, SensorInfo):
        return np.asarray(info_or_shifts.format.pixel_shift_by_row,
                          dtype=np.int64)
    return np.asarray(info_or_shifts, dtype=np.int64)


def _index_map(shifts: np.ndarray, w: int, inverse: bool) -> np.ndarray:
    sign = -1 if inverse else 1
    col = np.arange(w, dtype=np.int64)[None, :]
    return (col - sign * shifts[:, None]) % w  # (h, w)


def destagger(info_or_shifts, fields: np.ndarray,
              inverse: bool = False) -> np.ndarray:
    """Host path. fields: (h, w) or (h, w, n)."""
    shifts = _shifts(info_or_shifts)
    h, w = fields.shape[:2]
    if shifts.size != h:
        raise ValueError("image height does not match shifts size")
    idx = _index_map(shifts, w, inverse)
    if fields.ndim == 2:
        return np.take_along_axis(fields, idx, axis=1)
    flat_idx = idx[..., None]
    return np.take_along_axis(fields, flat_idx, axis=1)


def stagger(info_or_shifts, fields: np.ndarray) -> np.ndarray:
    return destagger(info_or_shifts, fields, inverse=True)


def destagger_jnp(fields: jnp.ndarray, shifts: Union[Sequence[int],
                  np.ndarray], inverse: bool = False) -> jnp.ndarray:
    """Device path: same semantics as destagger(), jit/vmap friendly.
    fields: (..., h, w) or (..., h, w, n) with shifts of length h — the
    gather indices are compile-time constants, so XLA fuses this into
    adjacent elementwise work for free."""
    shifts = np.asarray(shifts, dtype=np.int64)
    if fields.shape[-2] == shifts.size:
        w = fields.shape[-1]
        idx = jnp.asarray(_index_map(shifts, w, inverse))
        return jnp.take_along_axis(
            fields, idx.reshape((1,) * (fields.ndim - 2) + idx.shape),
            axis=-1)
    elif fields.shape[-3] == shifts.size:
        w = fields.shape[-2]
        idx = jnp.asarray(_index_map(shifts, w, inverse))[..., None]
        return jnp.take_along_axis(
            fields, idx.reshape((1,) * (fields.ndim - 3) + idx.shape),
            axis=-2)
    raise ValueError("image height does not match shifts size")


# typed variants matching the reference binding names (the C++ side has
# one per dtype, ref: client.pyi destagger_uint8...; ours is generic)
destagger_bool = destagger
destagger_int8 = destagger
destagger_int16 = destagger
destagger_int32 = destagger
destagger_int64 = destagger
destagger_uint8 = destagger
destagger_uint16 = destagger
destagger_uint32 = destagger
destagger_uint64 = destagger
destagger_float = destagger
destagger_double = destagger
