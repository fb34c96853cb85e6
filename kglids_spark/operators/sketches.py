"""Mergeable quantile sketch (KLL-style) in pure numpy.

Spark has no public KLL aggregate and the datasketches package is not
in this environment, so this is a compact from-scratch implementation
of the KLL algorithm (Karnin-Lang-Liberty, FOCS'16 — public
knowledge): a hierarchy of levels; level i holds items each
representing 2^i originals; a full level is sorted and every other
item (random offset) is promoted to level i+1. Deterministic seeding
per (level, compaction count) keeps merges reproducible across
retries — required for the idempotent-resume guarantee.

Serialized as bytes → stored per bucket in the checkpoint ledger,
merged associatively at read time (north_star: "KLL sketch quantiles
over n_tok ... merged idempotently").
"""

from __future__ import annotations

import io
import struct

import numpy as np


class KLL:
    def __init__(self, k: int = 256):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._compactions = 0

    # ---- updates ----------------------------------------------------------

    def update_batch(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self.n += int(values.size)
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()

    def _capacity(self, level: int) -> int:
        # geometrically decreasing capacity per level, floor of 8
        c = int(self.k * (2.0 / 3.0) ** (len(self.levels) - 1 - level))
        return max(c, 8)

    def _compress(self) -> None:
        while sum(len(lv) for lv in self.levels) > self._total_capacity():
            for i, lv in enumerate(self.levels):
                if len(lv) >= self._capacity(i):
                    if i + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    srt = np.sort(lv)
                    # deterministic alternating offset per compaction
                    off = self._compactions & 1
                    self._compactions += 1
                    promoted = srt[off::2]
                    self.levels[i] = np.empty(0, dtype=np.float64)
                    self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
                    break
            else:
                break

    def _total_capacity(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    # ---- queries -----------------------------------------------------------

    def quantiles(self, qs: list[float]) -> list[float | None]:
        if self.n == 0:
            return [None for _ in qs]
        items: list[np.ndarray] = []
        weights: list[np.ndarray] = []
        for i, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 2**i, dtype=np.int64))
        allv = np.concatenate(items)
        allw = np.concatenate(weights)
        order = np.argsort(allv, kind="stable")
        allv, allw = allv[order], allw[order]
        cum = np.cumsum(allw)
        total = cum[-1]
        out = []
        for q in qs:
            target = q * total
            idx = int(np.searchsorted(cum, target, side="left"))
            idx = min(idx, len(allv) - 1)
            out.append(float(allv[idx]))
        return out

    # ---- merge / serde ------------------------------------------------------

    def merge(self, other: "KLL") -> "KLL":
        out = KLL(k=min(self.k, other.k))
        out.n = self.n + other.n
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for i in range(depth):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
        out._compactions = self._compactions + other._compactions
        out._compress()
        return out

    def serialize(self) -> bytes:
        buf = io.BytesIO()
        buf.write(struct.pack("<iqii", self.k, self.n, self._compactions, len(self.levels)))
        for lv in self.levels:
            buf.write(struct.pack("<i", len(lv)))
            buf.write(lv.astype("<f8").tobytes())
        return buf.getvalue()

    @classmethod
    def deserialize(cls, data: bytes) -> "KLL":
        buf = io.BytesIO(data)
        k, n, comps, nlev = struct.unpack("<iqii", buf.read(20))
        out = cls(k=k)
        out.n = n
        out._compactions = comps
        out.levels = []
        for _ in range(nlev):
            (ln,) = struct.unpack("<i", buf.read(4))
            out.levels.append(np.frombuffer(buf.read(8 * ln), dtype="<f8").copy())
        return out


def merge_serialized(sketches: list[bytes]) -> KLL:
    out: KLL | None = None
    for raw in sketches:
        sk = KLL.deserialize(raw)
        out = sk if out is None else out.merge(sk)
    return out if out is not None else KLL()
