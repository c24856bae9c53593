"""Metadata file resolution next to a data file.

Rebuild of the reference's CLI-convenience metadata guessing
(ref: python/src/ouster/sdk/util/metadata.py:85-123): given a pcap/bag
path, find the metadata json(s) sharing the longest filename prefix.
The underlying prefix search lives in io.pcap_source; this module
provides the reference-named public wrappers.
"""

from __future__ import annotations

import os
from typing import List, Optional

from ..io.pcap_source import resolve_metadata_paths


def resolve_metadata(data_path: str,
                     meta_path: Optional[str] = None) -> Optional[str]:
    """Best-match metadata json for a data file, or the passed-through
    ``meta_path`` (ref: util/metadata.py:85-110)."""
    if meta_path is not None:
        if os.path.isfile(meta_path):
            return meta_path
        raise ValueError("Metadata path must be a file")
    paths = resolve_metadata_paths(data_path)
    return paths[0] if paths else None


def resolve_metadata_multi(data_path: str) -> List[str]:
    """All prefix-matched metadata jsons for a multi-sensor capture
    (ref: util/metadata.py:113-123)."""
    return resolve_metadata_paths(data_path)
