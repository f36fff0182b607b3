"""Small shared utilities (reference ``src/utils/utils.py`` equivalents)."""

from __future__ import annotations

import numpy as np


def scale_shift(x, scale: float, shift: float):
    """Latent normalization into model space (utils.py:20-21)."""
    return (x + shift) * scale


def scale_shift_re(x, scale: float, shift: float):
    """Inverse of scale_shift (utils.py:24-25)."""
    return (x / scale) - shift


def align_seq(source: np.ndarray, target_length: int, mapping_method: str = "hard"):
    """Nearest-index resampling along axis 1 (utils.py:28-37)."""
    source_len = source.shape[1]
    if mapping_method != "hard":
        raise NotImplementedError(mapping_method)
    idx = np.round(np.arange(target_length) * source_len / target_length).astype(int)
    idx = np.clip(idx, 0, source_len - 1)
    return source[:, idx]
