"""64-bit perceptual hash via numpy DCT (no scipy/PIL).

Classic pHash recipe: grayscale -> 32x32 downsample -> 2D DCT-II ->
top-left 8x8 block (skipping DC) -> sign-vs-median bits packed into an
int64.  Hamming distance between phashes approximates visual distance;
the frontier's priority scoring uses it as the novelty term
(BASELINE.json north_star: "phash-dedup novelty").
"""

from __future__ import annotations

import numpy as np

_N = 32  # downsample size
# DCT-II basis, orthonormal: C[k, n] = s(k) * cos(pi/N * (n + .5) * k)
_K = np.arange(_N)[:, None]
_NIDX = np.arange(_N)[None, :]
_DCT = np.cos(np.pi / _N * (_NIDX + 0.5) * _K)
_DCT[0] *= 1.0 / np.sqrt(2.0)
_DCT *= np.sqrt(2.0 / _N)

_BIT_WEIGHTS = (1 << np.arange(63, -1, -1).astype(np.uint64)).astype(np.uint64)


def _to_gray_32(pixels: np.ndarray) -> np.ndarray:
    gray = (
        0.299 * pixels[..., 0] + 0.587 * pixels[..., 1] + 0.114 * pixels[..., 2]
    ).astype(np.float64)
    h, w = gray.shape
    # nearest-neighbor downsample to 32x32 (deterministic, lib-free)
    yi = (np.arange(_N) * h) // _N
    xi = (np.arange(_N) * w) // _N
    return gray[np.ix_(yi, xi)]


def phash64(pixels: np.ndarray) -> int:
    """Perceptual hash of an (h, w, 3) uint8 image -> signed int64."""
    small = _to_gray_32(pixels)
    dct = _DCT @ small @ _DCT.T
    block = dct[:8, :8].copy().ravel()
    med = np.median(block[1:])  # skip DC term
    bits = (block > med).astype(np.uint64)
    val = np.uint64(np.sum(bits * _BIT_WEIGHTS))
    return int(np.int64(val))  # two's-complement into Spark LongType range


def phash64_batch(grays32: np.ndarray) -> np.ndarray:
    """Batched phash over an (n, 32, 32) float array of grayscale images.

    One einsum pair does the 2-D DCT for the whole batch — this is the
    vectorized path the image-decode Arrow UDF uses (no per-image DCT).
    """
    if grays32.size == 0:
        return np.zeros(0, dtype=np.int64)
    dct = np.einsum("kn,bnm,lm->bkl", _DCT, grays32.astype(np.float64), _DCT)
    block = dct[:, :8, :8].reshape(len(grays32), 64)
    med = np.median(block[:, 1:], axis=1, keepdims=True)
    bits = (block > med).astype(np.uint64)
    return (bits @ _BIT_WEIGHTS).astype(np.uint64).view(np.int64)


def gray32(pixels: np.ndarray) -> np.ndarray:
    """Public grayscale-downsample step (feeds :func:`phash64_batch`)."""
    return _to_gray_32(pixels)


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two 64-bit hashes stored as signed int64."""
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))


def hamming64_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance over int64 numpy arrays."""
    x = (a.astype(np.int64) ^ b.astype(np.int64)).astype(np.uint64)
    cnt = np.zeros_like(x, dtype=np.int64)
    for shift in range(0, 64, 8):
        cnt += _POPCOUNT8[(x >> np.uint64(shift)) & np.uint64(0xFF)]
    return cnt


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
