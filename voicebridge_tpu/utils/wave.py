"""RIFF WAV reading/writing with Kaldi sample semantics.

The reference reads 16-bit PCM into floats in the raw integer range
[-32768, 32767] *without* normalizing (``feat/wave-reader.h:106``); all MFCC
defaults (dither=1.0 etc.) assume that scale.  scipy handles the container.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from scipy.io import wavfile


def read_wave(path: str | Path) -> tuple[float, np.ndarray]:
    """Return ``(sample_rate, samples[float32, int16 scale])``; mono uses
    channel 0 like the reference's default."""
    rate, data = wavfile.read(str(path))
    if data.ndim == 2:
        data = data[:, 0]
    if data.dtype == np.int16:
        samples = data.astype(np.float32)
    elif data.dtype == np.int32:
        samples = (data / 65536.0).astype(np.float32)
    elif data.dtype in (np.float32, np.float64):
        samples = (data * 32768.0).astype(np.float32)
    elif data.dtype == np.uint8:
        samples = ((data.astype(np.float32) - 128.0) * 256.0)
    else:
        raise ValueError(f"unsupported wav dtype {data.dtype}")
    return float(rate), samples


def write_wave(path: str | Path, rate: float, samples: np.ndarray) -> None:
    """Write float samples in int16 scale as 16-bit PCM."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    clipped = np.clip(np.round(samples), -32768, 32767).astype(np.int16)
    wavfile.write(str(path), int(rate), clipped)
