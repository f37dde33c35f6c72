"""Read images/XML straight out of zip archives.

Equivalent of reference ``utils/zipreader.py:23-70``: paths of the form
``/path/archive.zip@member/inner.jpg`` are decoded without extraction,
with a process-wide handle cache.
"""
from __future__ import annotations

import os
import zipfile

import cv2
import numpy as np

_cache: dict[str, zipfile.ZipFile] = {}


def split_zip_path(path: str) -> tuple[str, str]:
    pos = path.index("@")
    return path[0:pos], path[pos + 1:]


def is_zip_path(path: str) -> bool:
    return ".zip@" in path


def _handle(zip_path: str) -> zipfile.ZipFile:
    key = os.path.abspath(zip_path)
    if key not in _cache:
        _cache[key] = zipfile.ZipFile(zip_path, "r")
    return _cache[key]


def read_bytes(path: str) -> bytes:
    zip_path, member = split_zip_path(path)
    return _handle(zip_path).read(member)


def imread(path: str, flags: int = cv2.IMREAD_COLOR) -> np.ndarray:
    """cv2.imread for ``archive.zip@member`` paths (zipreader.py:23-45)."""
    data = np.frombuffer(read_bytes(path), np.uint8)
    return cv2.imdecode(data, flags)


def xmlread(path: str):
    """Parse an XML member (zipreader.py:48-70)."""
    import xml.etree.ElementTree as ET

    return ET.fromstring(read_bytes(path).decode("utf-8"))
