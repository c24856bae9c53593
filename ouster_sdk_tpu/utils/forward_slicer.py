"""Forward-only slice semantics for scan sources.

Rebuild of the reference ForwardSlicer (ref: python/src/ouster/sdk/util/
forward_slicer.py): normalizes python slices (including negative indices
and negative steps) into a forward window [start, stop) with the step
sign preserved, then slices by iterating the source forward only.
Contract (matching the reference): `slice_iter`/`slice` take an iterator
whose FIRST element sits at index `key.start`; for a negative step they
yield the selected elements in forward order — the caller reverses
(ref: python/tests/test_forward_slicer.py NormalizedSliceable).
"""

from __future__ import annotations

from typing import Iterator, List


class ForwardSlicer:
    @staticmethod
    def normalize(key: slice, length: int) -> slice:
        """Resolve a slice against a known length into a forward window:
        result has start <= stop and keeps the step's sign
        (ref: forward_slicer.py:9-33)."""
        step = 1 if key.step is None else key.step
        if step == 0:
            raise ValueError("slice step cannot be zero")

        def clamp(value, default):
            if value is None:
                return default
            if value < 0:
                return max(0, length + value)
            return min(value, length)

        if step > 0:
            start = clamp(key.start, 0)
            stop = clamp(key.stop, length)
        else:
            start = clamp(key.stop, -1) + 1
            stop = min(length, clamp(key.start, length) + 1)
        return slice(start, stop, step)

    @staticmethod
    def _stepper(data_iter: Iterator, start: int, stop: int,
                 step: int) -> Iterator:
        """Yield every |step|-th element of [start, stop); for negative
        steps the picks are aligned to the window END so that reversing
        the output equals native negative-step slicing
        (ref: forward_slicer.py:36-55)."""
        if step < 0:
            step = -step
            aligned_start = (stop - 1) - (stop - start) // step * step
            if aligned_start < start:
                aligned_start += step
            for _ in range(aligned_start - start):
                next(data_iter)
        count = 0
        while count < stop - start:
            try:
                count += 1
                yield next(data_iter)
                for _ in range(step - 1):
                    count += 1
                    next(data_iter)
            except StopIteration:
                break

    @staticmethod
    def slice_iter(data_iter: Iterator, key: slice) -> Iterator:
        """Lazily slice a forward iterator positioned at key.start with a
        normalized key (start <= stop); negative-step selections come out
        in forward order (ref: forward_slicer.py:57-69)."""
        return ForwardSlicer._stepper(data_iter, key.start, key.stop,
                                      key.step)

    @staticmethod
    def slice(data_iter: Iterator, key: slice) -> List:
        """Eager version of slice_iter (ref: forward_slicer.py:71-82)."""
        return [*ForwardSlicer._stepper(data_iter, key.start, key.stop,
                                        key.step)]
