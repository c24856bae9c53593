"""Forward-only slice semantics for scan sources.

Rebuild of the reference ForwardSlicer (ref: python/src/ouster/sdk/util/
forward_slicer.py): normalizes python slices against forward-iterable
sources, supporting negative indices/steps by index arithmetic while only
ever iterating forward.
"""

from __future__ import annotations

from typing import Iterator, Optional


class ForwardSlicer:
    @staticmethod
    def normalize(s: slice, length: int) -> slice:
        """Resolve a slice against a known length; result always has
        start <= stop and preserves step sign semantics."""
        start, stop, step = s.indices(length)
        return slice(start, stop, step)

    @staticmethod
    def slice_iter(it: Iterator, s: slice) -> Iterator:
        """Apply a (normalized, positive-step) slice lazily to an
        iterator."""
        step = s.step or 1
        if step <= 0:
            raise ValueError("forward slicing requires a positive step")
        start = s.start or 0
        stop = s.stop
        for i, item in enumerate(it):
            if stop is not None and i >= stop:
                return
            if i >= start and (i - start) % step == 0:
                yield item

    @staticmethod
    def slice(indexable, s: slice):
        """Random-access slice over an indexed source."""
        n = len(indexable)
        start, stop, step = s.indices(n)
        return [indexable[i] for i in range(start, stop, step)]
