"""Hash functions used everywhere (SURVEY.md O1/O10; reference: src/crc32.cpp,
src/md5.c checksum roles).

The single fixed 64-bit string hash of the engine is **FNV-1a 64**
(public-domain Fowler–Noll–Vo). FIXTURES.md originally suggested xxhash64;
no xxhash binding is available in this sandbox, so FNV-1a64 is the pinned
hash — used consistently by the fixture generator, the reference simulator
and the engine, which is the only property the conformance contract needs.

Two implementations:
  * ``fnv1a64`` — scalar, for single strings (driver-side, tests).
  * ``fnv1a64_arrow`` — vectorized over an Arrow string/binary array using
    zero-copy buffer access + numpy column-sweep; O(max_len) numpy kernels,
    no per-row Python. Intended for short strings (URLs, hosts).

For long binary bodies (content checksum, O10) use ``content_hash64`` —
a per-row loop over C-speed blake2b; bodies are KB–MB so the per-call
overhead is negligible relative to digest time.

All hashes are returned as **int64** (the uint64 bit pattern reinterpreted)
so they round-trip cleanly through Arrow/Parquet/DuckDB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_U64 = np.uint64
_MASK64 = (1 << 64) - 1


def fnv1a64(data: bytes | str) -> int:
    """Scalar FNV-1a 64 over bytes (str is encoded UTF-8). Returns int64."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h - (1 << 64) if h >= (1 << 63) else h


def _string_array_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lengths, starts, data) views over an Arrow string/binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.binary())
    elif pa.types.is_string(arr.type):
        arr = arr.cast(pa.binary())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        lengths = np.where(valid, lengths, 0)
    return lengths, starts, data


_FNV_CHUNK = 16384  # bound temp-matrix allocs (large first-touch allocations
                    # stall multi-seconds under this VM's THP compaction)


def fnv1a64_arrow(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized FNV-1a64 of each element of a string/binary Arrow array.

    Returns an int64 ndarray (uint64 bits reinterpreted). Nulls hash as the
    empty string. Cost is O(n * max_len) numpy ops swept column-wise in
    bounded chunks — designed for short strings (URLs), not bodies.
    """
    lengths, starts, data = _string_array_buffers(arr)
    n = len(lengths)
    out = np.empty(n, dtype=_U64)
    prime = _U64(_FNV_PRIME)
    for lo in range(0, n, _FNV_CHUNK):
        hi = min(lo + _FNV_CHUNK, n)
        cl = lengths[lo:hi]
        cs = starts[lo:hi]
        m = hi - lo
        max_len = int(cl.max()) if m else 0
        h = np.full(m, _FNV_OFFSET, dtype=_U64)
        if max_len:
            col_idx = np.arange(max_len, dtype=np.int64)
            mask = col_idx[None, :] < cl[:, None]             # (m, max_len)
            idx = cs[:, None] + col_idx[None, :]
            matrix = np.zeros((m, max_len), dtype=np.uint8)
            matrix[mask] = data[idx[mask]]
            with np.errstate(over="ignore"):
                for j in range(max_len):
                    mj = mask[:, j]
                    if not mj.any():
                        break
                    h[mj] = (h[mj] ^ matrix[:, j][mj].astype(_U64)) * prime
        out[lo:hi] = h
    if n == 0:
        return np.empty(0, dtype=np.int64)
    return out.view(np.int64)


def content_hash64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-element 64-bit blake2b content checksum of a binary/string column
    (SURVEY O10 — clone detection / unchanged-content skip). Per-row loop is
    deliberate: each call is a C-speed digest over a KB+ body."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = np.empty(len(arr), dtype=np.int64)
    uint_view = out.view(np.uint64)
    for i, v in enumerate(arr):
        raw = v.as_py()
        if raw is None:
            raw = b""
        elif isinstance(raw, str):
            raw = raw.encode("utf-8")
        uint_view[i] = int.from_bytes(
            hashlib.blake2b(raw, digest_size=8).digest(), "little"
        )
    return out
