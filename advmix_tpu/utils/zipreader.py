"""Read images directly from `archive.zip@member` paths.

Behavioral reference: `lib/utils/zipreader.py:23-46` (cached open zipfiles,
selected by DATASET.DATA_FORMAT == 'zip').
"""

from __future__ import annotations

import zipfile

import cv2
import numpy as np

_CACHE: dict = {}


def split_zip_path(path: str):
    assert "@" in path, f"not a zip path: {path}"
    archive, member = path.split("@", 1)
    return archive, member.lstrip("/")


def imread(path: str, flags=cv2.IMREAD_COLOR):
    archive, member = split_zip_path(path)
    if archive not in _CACHE:
        _CACHE[archive] = zipfile.ZipFile(archive, "r")
    data = _CACHE[archive].read(member)
    return cv2.imdecode(np.frombuffer(data, np.uint8), flags)
