"""Deterministic hashing kernels for dedup / blocking / fingerprints.

Python's builtin ``hash`` is process-salted (PYTHONHASHSEED), so every
hash here is an explicit, seedable 64-bit mix that produces identical
values on every executor and in-process.  numpy-vectorized where the
operators need per-batch throughput.
"""

from __future__ import annotations

import zlib
from typing import List, Sequence

import numpy as np

_MASK64 = (1 << 64) - 1
# splitmix64 constants — standard public-domain mixer.
_SM_GAMMA = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB

# Mersenne prime 2^31-1 for universal hashing a*x+b mod p: with 31-bit
# a and x the product fits in uint64, so the whole shingles x perms
# matrix vectorizes in numpy (no bigint fallback in the hot path).
_MERSENNE31 = (1 << 31) - 1


def hash64(s: str, seed: int = 0) -> int:
    """Stable 64-bit hash of a string: crc32 of bytes folded through
    splitmix64 with the seed.  Deterministic across processes."""
    data = s.encode("utf-8")
    base = (zlib.crc32(data) << 32) ^ zlib.crc32(data[::-1]) ^ len(data)
    return splitmix64(base ^ (seed * _SM_GAMMA & _MASK64))


def splitmix64(x: int) -> int:
    x = (x + _SM_GAMMA) & _MASK64
    x = ((x ^ (x >> 30)) * _SM_M1) & _MASK64
    x = ((x ^ (x >> 27)) * _SM_M2) & _MASK64
    return x ^ (x >> 31)


def _np_splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(_SM_GAMMA))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(_SM_M1)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(_SM_M2)
    return x ^ (x >> np.uint64(31))


def hash64_batch(strings: Sequence[str], seed: int = 0) -> np.ndarray:
    """Vectorized-ish hash64 over a batch (crc32 per string is C-speed)."""
    base = np.fromiter(
        (
            ((zlib.crc32(b) << 32) ^ zlib.crc32(b[::-1]) ^ len(b)) & _MASK64
            for b in (s.encode("utf-8") for s in strings)
        ),
        dtype=np.uint64,
        count=len(strings),
    )
    with np.errstate(over="ignore"):
        return _np_splitmix64(base ^ np.uint64((seed * _SM_GAMMA) & _MASK64))


def minhash_params(num_perm: int, seed: int = 1227) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) coefficient arrays for num_perm universal hash functions
    h_i(x) = (a_i * x + b_i) mod (2^31-1).  Seed default mirrors the
    reference's reproducibility seed (rex/utils/config.py:203)."""
    state = seed
    a = np.empty(num_perm, dtype=np.uint64)
    b = np.empty(num_perm, dtype=np.uint64)
    for i in range(num_perm):
        state = splitmix64(state)
        a[i] = (state % (_MERSENNE31 - 1)) + 1
        state = splitmix64(state)
        b[i] = state % _MERSENNE31
    return a, b


def minhash_signature(
    shingles: Sequence[str], params: tuple[np.ndarray, np.ndarray]
) -> List[int]:
    """MinHash signature (one min per permutation) over string shingles.

    Empty shingle sets get the max sentinel in every slot so they never
    collide with real content in an LSH band join.
    """
    a, b = params
    if not shingles:
        return [_MERSENNE31] * len(a)
    base = hash64_batch(list(shingles)) % np.uint64(_MERSENNE31)  # (S,)
    with np.errstate(over="ignore"):
        # (S, P) products fit in uint64: both factors < 2^31.
        vals = (base[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE31)
    return vals.min(axis=0).astype(np.int64).tolist()


def minhash_signatures_batch(
    shingle_lists: Sequence[Sequence[str]],
    params: tuple[np.ndarray, np.ndarray],
) -> np.ndarray:
    """MinHash signatures for a whole batch of documents at once.

    Flattens every document's shingles into one hash pass, then takes
    per-document minima one PERMUTATION at a time: a (T,) value vector
    plus its ``np.minimum.reduceat`` stays L2-resident, where the
    one-shot (T, P) matrix formulation goes to DRAM for every op
    (measured 20.7s -> 1.1s on an 80k-surface, 1.4M-shingle batch; the
    per-doc scalar variant additionally spends ~0.5 ms/doc on
    dispatch).  Returns (D, P) int64; rows for empty shingle sets are
    the max sentinel, exactly like :func:`minhash_signature` — pinned
    equal to the scalar path by tests.
    """
    a, b = params
    num_perm = len(a)
    d = len(shingle_lists)
    out = np.full((d, num_perm), _MERSENNE31, dtype=np.int64)
    lengths = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64, count=d)
    nonempty = np.flatnonzero(lengths)
    if len(nonempty) == 0:
        return out
    flat: List[str] = []
    for i in nonempty:
        flat.extend(shingle_lists[i])
    m31 = np.uint64(_MERSENNE31)
    base = hash64_batch(flat) % m31
    offsets = np.zeros(len(nonempty), dtype=np.int64)
    np.cumsum(lengths[nonempty][:-1], out=offsets[1:])
    mins = np.empty((len(nonempty), num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            # both factors < 2^31: products fit in uint64
            vals = (base * a[p] + b[p]) % m31
            mins[:, p] = np.minimum.reduceat(vals, offsets)
    out[nonempty] = mins.astype(np.int64)
    return out


def band_keys_batch(signatures: np.ndarray, bands: int) -> np.ndarray:
    """LSH band keys for a (D, P) signature matrix -> (D, bands) uint64.

    Same splitmix64 fold as :func:`band_keys`, vectorized across the
    document and band axes (the scalar chain runs rows-per-band times
    on (D, bands) lanes)."""
    d, n = signatures.shape
    rows = n // bands
    sig3 = signatures.astype(np.uint64).reshape(d, bands, rows)
    acc = np.empty((1, bands), dtype=np.uint64)
    for b in range(bands):
        acc[0, b] = splitmix64(b + 0x5EED)
    acc = np.broadcast_to(acc, (d, bands)).copy()
    with np.errstate(over="ignore"):
        for i in range(rows):
            acc = _np_splitmix64(acc ^ sig3[:, :, i])
    return acc


def band_keys(signature: Sequence[int], bands: int) -> List[int]:
    """LSH banding: split the signature into ``bands`` equal rows-per-band
    groups and hash each group to a 64-bit bucket key."""
    n = len(signature)
    rows = n // bands
    keys = []
    for b in range(bands):
        acc = splitmix64(b + 0x5EED)
        for v in signature[b * rows : (b + 1) * rows]:
            acc = splitmix64(acc ^ v)
        keys.append(acc)
    return keys


def simhash64(tokens: Sequence[str]) -> int:
    """64-bit SimHash over token hashes (sign of per-bit weighted sums)."""
    if not tokens:
        return 0
    hs = hash64_batch(list(tokens))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    sums = (2 * bits - 1).sum(axis=0)
    return int(
        np.bitwise_or.reduce(
            (sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(tokens: Sequence[str], prime: int = 1_000_003) -> int:
    """Order-sensitive polynomial rolling hash of a token sequence
    (document fingerprinting; exact-duplicate detection)."""
    acc = 0
    for t in tokens:
        acc = (acc * prime + hash64(t)) & _MASK64
    return acc
