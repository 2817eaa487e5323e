"""Cuckoo filter (Fan et al., CoNEXT 2014 — public algorithm) used as the
fast membership path of the URL-seen set (SURVEY.md T1; north_rule:
"bloom/cuckoo URL-seen").

Semantics contract: the filter may return false positives, NEVER false
negatives for inserted items (until capacity overflow, which raises).
The seen-set shard therefore uses it as a negative-path short-circuit —
"definitely new" skips the exact-set lookup — while the exact per-shard
set remains the source of truth (SURVEY §7 hard part (b): cuckoo false
positives must not drop URLs).

Storage: numpy uint16 table of (n_buckets, 4) 16-bit fingerprints;
0 = empty slot (fingerprints are forced non-zero).
"""

from __future__ import annotations

import numpy as np

_FP_MASK = 0xFFFF
_MAX_KICKS = 500


def _mix(x: np.ndarray | int) -> np.ndarray | int:
    """64-bit finalizer (splitmix64-style, public domain) for deriving
    bucket/fingerprint streams from the already-hashed url_hash."""
    x = np.uint64(x) if not isinstance(x, np.ndarray) else x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0):
        # 4 slots/bucket at ~95% max load; round buckets to power of two
        n_buckets = 1
        need = max(16, int(capacity / 4 / 0.95) + 1)
        while n_buckets < need:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self._mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.Generator(np.random.PCG64(seed))  # eviction picks

    # --- derivation -------------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (_mix(h) & np.uint64(_FP_MASK)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _b1(self, h: np.ndarray) -> np.ndarray:
        return (np.asarray(h, dtype=np.int64).view(np.uint64) & self._mask).astype(np.int64)

    def _alt(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return ((b.astype(np.uint64) ^ _mix(fp.astype(np.uint64))) & self._mask).astype(np.int64)

    # --- single-item ops --------------------------------------------------
    def insert(self, h: int) -> None:
        self.insert_many(np.array([h], dtype=np.int64))

    def _insert_evict(self, b1: int, b2: int, fp: int) -> None:
        """Eviction path (rare): both candidate buckets full."""
        b = b1 if self._rng.random() < 0.5 else b2
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(4))
            cur, self.table[b, slot] = self.table[b, slot], cur
            b = int(self._alt(np.array([b]), np.array([cur], dtype=np.uint16))[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return
        raise RuntimeError("cuckoo filter full — shard over capacity, re-shard")

    # --- batched ops ------------------------------------------------------
    def insert_many(self, hashes: np.ndarray) -> None:
        """Bulk insert: fingerprints and both candidate buckets are derived
        in three vectorized sweeps; the per-item loop is plain slot probing
        (no per-item numpy allocation — the scalar ``insert`` costs ~40us
        per item in array setup alone, this path ~2us)."""
        h = np.asarray(hashes, dtype=np.int64)
        if h.size == 0:
            return
        fp = self._fp(h.view(np.uint64))
        b1 = self._b1(h)
        b2 = self._alt(b1, fp)
        tbl = self.table
        fpl = fp.tolist()
        b1l = b1.tolist()
        b2l = b2.tolist()
        for i in range(len(fpl)):
            f = fpl[i]
            placed = False
            for b in (b1l[i], b2l[i]):
                row = tbl[b]
                for s in range(4):
                    if row[s] == 0:
                        row[s] = f
                        self.count += 1
                        placed = True
                        break
                if placed:
                    break
            if not placed:
                self._insert_evict(b1l[i], b2l[i], f)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe present, False = definitely absent."""
        h = np.asarray(hashes, dtype=np.int64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(h.view(np.uint64))
        b1 = self._b1(h)
        b2 = self._alt(b1, fp)
        r1 = self.table[b1]  # (n, 4)
        r2 = self.table[b2]
        fpc = fp[:, None]
        return ((r1 == fpc).any(axis=1)) | ((r2 == fpc).any(axis=1))

    def __contains__(self, h: int) -> bool:
        return bool(self.contains_many(np.array([h]))[0])

    # --- snapshot ---------------------------------------------------------
    def state(self) -> dict:
        return {"n_buckets": self.n_buckets, "count": self.count,
                "table": self.table.copy()}

    @classmethod
    def from_state(cls, st: dict, seed: int = 0) -> "CuckooFilter":
        f = cls(capacity=st["n_buckets"] * 4, seed=seed)
        if f.n_buckets != st["n_buckets"]:
            f.n_buckets = st["n_buckets"]
            f._mask = np.uint64(st["n_buckets"] - 1)
        f.table = st["table"].copy()
        f.count = st["count"]
        return f
