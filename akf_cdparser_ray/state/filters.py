"""URL-seen membership filters (SURVEY.md §2.3 ST7, §2.7 D2).

A per-shard cuckoo filter (bloom fallback) sized for the 10^10-entry URL-seen
set the north rule demands: at ~16 bits/entry a 10^10 frontier costs ~20 GB
*across the cluster*, so the filter must be sharded (``url_hash % S``),
serializable (checkpoint pages) and deterministic. Implementation is
numpy-backed and dependency-free.

Shard actors live in ``stages/dedupe.py``; this module is pure state.
"""

from __future__ import annotations

import struct

import numpy as np

_EMPTY = 0  # fingerprint 0 is reserved as "empty slot"


class CuckooFilter:
    """4-way bucketed cuckoo filter with 16-bit fingerprints.

    Deterministic: insert order fully defines the table; eviction victims are
    chosen by a rotating counter, not randomness (replay requirement).
    """

    MAGIC = b"CKF1"

    def __init__(self, capacity: int = 1 << 16, max_kicks: int = 500):
        nbuckets = 1
        while nbuckets * 4 < capacity:
            nbuckets <<= 1
        self.nbuckets = nbuckets
        self.table = np.zeros((nbuckets, 4), dtype=np.uint16)
        self.max_kicks = max_kicks
        self.count = 0
        self._kick_counter = 0

    # -- hashing helpers ---------------------------------------------------
    def _fingerprint(self, h: int) -> int:
        fp = (h >> 48) & 0xFFFF
        return fp if fp != _EMPTY else 1

    def _index1(self, h: int) -> int:
        return h & (self.nbuckets - 1)

    def _index2(self, i1: int, fp: int) -> int:
        # standard partial-key cuckoo: i2 = i1 ^ hash(fp)
        return (i1 ^ (fp * 0x5BD1E995)) & (self.nbuckets - 1)

    # -- operations --------------------------------------------------------
    def contains(self, h: int) -> bool:
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        if fp in self.table[i1]:
            return True
        i2 = self._index2(i1, fp)
        return fp in self.table[i2]

    def add(self, h: int) -> bool:
        """Insert; returns False if the filter is (effectively) full."""
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict deterministically
        i = i1
        for _ in range(self.max_kicks):
            slot = self._kick_counter % 4
            self._kick_counter += 1
            victim = int(self.table[i][slot])
            self.table[i][slot] = fp
            fp = victim
            i = self._index2(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        return False

    def check_and_add(self, h: int) -> bool:
        """True if ``h`` was new (and is now recorded)."""
        if self.contains(h):
            return False
        if not self.add(h):
            raise RuntimeError("cuckoo filter full; resize the shard")
        return True

    # -- vectorized batch probes ------------------------------------------
    def contains_many(self, hs: np.ndarray) -> np.ndarray:
        """Vectorized membership probe: one table gather instead of a Python
        loop (the hot path of the crawl's cross-wave dedupe RPC)."""
        hs = np.asarray(hs, dtype=np.uint64)
        if hs.size == 0:
            return np.zeros(0, dtype=bool)
        fp = ((hs >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == _EMPTY] = 1
        i1 = (hs & np.uint64(self.nbuckets - 1)).astype(np.int64)
        i2 = (i1 ^ (fp.astype(np.int64) * 0x5BD1E995)) & (self.nbuckets - 1)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def check_and_add_many(self, hs: np.ndarray) -> np.ndarray:
        """Batch check_and_add: vectorized contains pre-pass (the common
        rejection path at steady state), Python insert loop only over the
        genuinely-new survivors (eviction chains aren't vectorizable)."""
        hs = np.asarray(hs, dtype=np.uint64)
        out = np.zeros(len(hs), dtype=bool)
        known = self.contains_many(hs)
        local: set[int] = set()
        for idx in np.flatnonzero(~known):
            h = int(hs[idx])
            if h in local:
                continue
            local.add(h)
            if not self.add(h):
                raise RuntimeError("cuckoo filter full; resize the shard")
            out[idx] = True
        return out

    # -- checkpoint pages --------------------------------------------------
    def serialize(self) -> bytes:
        return (
            self.MAGIC
            + struct.pack("<QQQ", self.nbuckets, self.count, self._kick_counter)
            + self.table.tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "CuckooFilter":
        if data[:4] != cls.MAGIC:
            raise ValueError("bad cuckoo page")
        nbuckets, count, kicks = struct.unpack_from("<QQQ", data, 4)
        f = cls.__new__(cls)
        f.nbuckets = nbuckets
        f.count = count
        f._kick_counter = kicks
        f.max_kicks = 500
        f.table = np.frombuffer(data[28:], dtype=np.uint16).reshape(nbuckets, 4).copy()
        return f


class BloomFilter:
    """k-hash bloom filter fallback (no deletions, zero false negatives)."""

    MAGIC = b"BLM1"

    def __init__(self, capacity: int = 1 << 16, bits_per_entry: int = 12):
        nbits = 1
        while nbits < capacity * bits_per_entry:
            nbits <<= 1
        self.nbits = nbits
        self.bits = np.zeros(nbits // 8, dtype=np.uint8)
        self.k = 7
        self.count = 0

    def _positions(self, h: int):
        h1 = h & 0xFFFFFFFFFFFFFFFF
        h2 = ((h >> 32) | (h << 32)) & 0xFFFFFFFFFFFFFFFF
        for i in range(self.k):
            yield (h1 + i * h2 + i * i) % self.nbits

    def contains(self, h: int) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(h))

    def add(self, h: int) -> bool:
        for p in self._positions(h):
            self.bits[p >> 3] |= 1 << (p & 7)
        self.count += 1
        return True

    def check_and_add(self, h: int) -> bool:
        if self.contains(h):
            return False
        self.add(h)
        return True

    def _positions_many(self, hs: np.ndarray) -> np.ndarray:
        h1 = hs.astype(np.uint64)
        h2 = ((h1 >> np.uint64(32)) | (h1 << np.uint64(32)))
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None] + (i * i)[None, :]) % np.uint64(self.nbits)

    def contains_many(self, hs: np.ndarray) -> np.ndarray:
        hs = np.asarray(hs, dtype=np.uint64)
        if hs.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions_many(hs)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return ((self.bits[byte_idx] & bit) != 0).all(axis=1)

    def add_many(self, hs: np.ndarray) -> None:
        """Bulk insert (vectorized): set all k positions for every hash in
        one ``bitwise_or.at`` scatter. Used by the bloom-join partial-page
        build — pages merge by OR, so insertion order/batching is
        irrelevant."""
        hs = np.asarray(hs, dtype=np.uint64)
        if hs.size == 0:
            return
        pos = self._positions_many(hs)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64).ravel()
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)).ravel()
        np.bitwise_or.at(self.bits, byte_idx, bit)
        self.count += int(hs.size)

    def check_and_add_many(self, hs: np.ndarray) -> np.ndarray:
        hs = np.asarray(hs, dtype=np.uint64)
        out = np.zeros(len(hs), dtype=bool)
        known = self.contains_many(hs)
        local: set[int] = set()
        for idx in np.flatnonzero(~known):
            h = int(hs[idx])
            if h in local:
                continue
            local.add(h)
            self.add(h)
            out[idx] = True
        return out

    def serialize(self) -> bytes:
        return self.MAGIC + struct.pack("<QQ", self.nbits, self.count) + self.bits.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        if data[:4] != cls.MAGIC:
            raise ValueError("bad bloom page")
        nbits, count = struct.unpack_from("<QQ", data, 4)
        f = cls.__new__(cls)
        f.nbits = nbits
        f.count = count
        f.k = 7
        f.bits = np.frombuffer(data[20:], dtype=np.uint8).copy()
        return f


def deserialize_filter(data: bytes):
    if data[:4] == CuckooFilter.MAGIC:
        return CuckooFilter.deserialize(data)
    if data[:4] == BloomFilter.MAGIC:
        return BloomFilter.deserialize(data)
    raise ValueError("unknown filter page")
