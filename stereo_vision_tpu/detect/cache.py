"""Detection result cache keyed by image hash.

Parity with the reference's Roboflow detector cache (reference:
scripts/archive/roboflow_ball_detector.py:161-168, :290-292): expensive
detector calls (hosted APIs, large models) are memoized on the MD5 of the
image bytes, persisted as a pickle so repeat runs skip inference.
"""

from __future__ import annotations

import hashlib
import pickle
from pathlib import Path
from typing import Any, Callable

import numpy as np


def image_hash(image: np.ndarray) -> str:
    return hashlib.md5(np.ascontiguousarray(image).tobytes()).hexdigest()


class DetectionCache:
    """Persistent {image_hash: result} store."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._cache: dict[str, Any] = {}
        if self.path.exists():
            try:
                with open(self.path, "rb") as f:
                    self._cache = pickle.load(f)
            except (OSError, pickle.UnpicklingError):
                self._cache = {}

    def __len__(self) -> int:
        return len(self._cache)

    def get(self, image: np.ndarray) -> Any | None:
        return self._cache.get(image_hash(image))

    def put(self, image: np.ndarray, result: Any) -> None:
        self._cache[image_hash(image)] = result

    def save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "wb") as f:
            pickle.dump(self._cache, f)

    def cached(self, fn: Callable[[np.ndarray], Any]) -> Callable[[np.ndarray], Any]:
        """Wrap a detector so repeat images skip inference."""

        def wrapper(image: np.ndarray) -> Any:
            hit = self.get(image)
            if hit is not None:
                return hit
            out = fn(image)
            self.put(image, out)
            return out

        return wrapper
