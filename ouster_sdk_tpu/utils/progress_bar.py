"""Terminal progress bar (ref: python/src/ouster/sdk/util/progress_bar.py)."""

from __future__ import annotations

import sys


def progress_bar(progress: float, width: int = 40,
                 suffix: str = "") -> None:
    """Draw an in-place progress bar for `progress` in [0, 1]."""
    progress = min(max(progress, 0.0), 1.0)
    filled = int(width * progress)
    bar = "#" * filled + "-" * (width - filled)
    sys.stderr.write(f"\r[{bar}] {progress * 100:5.1f}% {suffix}")
    if progress >= 1.0:
        sys.stderr.write("\n")
    sys.stderr.flush()
