"""Pure-Python reader for Spark's serialized count-min sketch.

``F.count_min_sketch`` returns the binary produced by
``org.apache.spark.util.sketch.CountMinSketch.writeTo`` (format V1, a
DataOutputStream dump: int version, long totalCount, int depth, int width,
``depth`` longs of per-row hash seeds, then the ``depth``×``width`` counter
table row-major — all big-endian). Decoding it here instead of calling back
into the JVM through ``spark._jvm`` keeps the probe on public API only, so it
works identically in classic and Spark Connect sessions (``_jvm`` does not
exist under Connect).

The estimate reimplements ``CountMinSketchImpl.estimateCount`` for long keys:
row ``i`` buckets ``item`` at ``((hashA[i] * item) folded mod 2^31-1) %
width`` with Java's wrapping 64-bit arithmetic, and the estimate is the min
counter across rows. Equality with the JVM implementation is asserted
bit-for-bit in tests/test_plans.py (classic mode exposes both paths).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_MASK64 = (1 << 64) - 1
_PRIME_MODULUS = (1 << 31) - 1


def _to_signed64(x: int) -> int:
    x &= _MASK64
    return x - (1 << 64) if x >= (1 << 63) else x


@dataclass(frozen=True)
class CountMinSketch:
    total_count: int
    depth: int
    width: int
    hash_a: tuple[int, ...]
    table: tuple[tuple[int, ...], ...]

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        version, total_count, depth, width = struct.unpack_from(">iqii", data, 0)
        if version != 1:
            raise ValueError(f"unsupported count-min sketch version: {version}")
        off = struct.calcsize(">iqii")
        hash_a = struct.unpack_from(f">{depth}q", data, off)
        off += 8 * depth
        table = []
        for _ in range(depth):
            table.append(struct.unpack_from(f">{width}q", data, off))
            off += 8 * width
        return cls(total_count, depth, width, hash_a, tuple(table))

    def _bucket(self, item: int, row: int) -> int:
        # Java: hash = hashA[row] * item; hash += hash >> 32;
        #       hash &= PRIME_MODULUS; return ((int) hash) % width
        # 64-bit wrapping multiply, arithmetic shift, then the fold lands in
        # [0, 2^31-1] so the (int) cast and % are value-preserving.
        h = _to_signed64(self.hash_a[row] * item)
        h = _to_signed64(h + (h >> 32))
        h &= _PRIME_MODULUS
        return h % self.width

    def estimate_count(self, item: int) -> int:
        """Point-frequency estimate for a long key: min over the d rows.
        Guaranteed >= true count; <= true + eps*N with probability 1-delta."""
        return min(self.table[i][self._bucket(item, i)] for i in range(self.depth))
