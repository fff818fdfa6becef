"""Genomic interval sets.

Equivalent of the reference's RegionList (src/RegionList.cpp: ReadRegionList
at :15, IsOverlapped :48, Collapse :78, Join :120) — BED loading, interval
collapsing, inner/outer joins, point-overlap queries and size accounting.
Intervals are stored half-open 0-based [start, end) as in BED.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RegionList:
    regions: dict[str, list[tuple[int, int]]] = field(default_factory=dict)
    collapsed: bool = False

    def read_region_list(self, path: str, collapse: bool = True) -> "RegionList":
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith(("#", "track", "browser")):
                    continue
                parts = line.split()
                chrom, start, end = parts[0], int(parts[1]), int(parts[2])
                chrom = chrom.upper()
                if chrom.startswith("CHR"):
                    chrom = chrom[3:]
                self.add(chrom, start, end)
        if collapse:
            self.collapse()
        return self

    def add(self, chrom: str, start: int, end: int) -> None:
        self.regions.setdefault(chrom, []).append((start, end))
        self.collapsed = False

    def collapse(self) -> None:
        """Merge overlapping/adjacent intervals per chromosome."""
        for chrom, ivs in self.regions.items():
            ivs.sort()
            merged: list[tuple[int, int]] = []
            for s, e in ivs:
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            self.regions[chrom] = merged
        self.collapsed = True

    def is_overlapped(self, chrom: str, pos: int) -> bool:
        """Point query: is 1-based position inside any interval?"""
        ivs = self.regions.get(chrom)
        if not ivs:
            return False
        import bisect

        p0 = pos - 1  # 0-based
        i = bisect.bisect_right(ivs, (p0, float("inf")))
        if i > 0:
            s, e = ivs[i - 1]
            if s <= p0 < e:
                return True
        return False

    def overlaps_interval(self, chrom: str, start: int, end: int) -> bool:
        """Does [start, end) 0-based intersect any interval?"""
        ivs = self.regions.get(chrom)
        if not ivs:
            return False
        import bisect

        i = bisect.bisect_right(ivs, (start, float("inf")))
        for j in (i - 1, i):
            if 0 <= j < len(ivs):
                s, e = ivs[j]
                if s < end and start < e:
                    return True
        return False

    def overlap_len(self, chrom: str, start: int, end: int) -> int:
        """Total overlapped bases of [start, end) with the set."""
        ivs = self.regions.get(chrom, [])
        total = 0
        for s, e in ivs:
            lo, hi = max(s, start), min(e, end)
            if lo < hi:
                total += hi - lo
        return total

    def join_inner(self, other: "RegionList") -> "RegionList":
        """Intersection of two collapsed region lists."""
        out = RegionList()
        for chrom in self.regions:
            if chrom not in other.regions:
                continue
            a, b = self.regions[chrom], other.regions[chrom]
            i = j = 0
            while i < len(a) and j < len(b):
                s = max(a[i][0], b[j][0])
                e = min(a[i][1], b[j][1])
                if s < e:
                    out.add(chrom, s, e)
                if a[i][1] < b[j][1]:
                    i += 1
                else:
                    j += 1
        out.collapsed = True
        return out

    def join_outer(self, other: "RegionList") -> "RegionList":
        """Union of two region lists."""
        out = RegionList()
        for src in (self, other):
            for chrom, ivs in src.regions.items():
                for s, e in ivs:
                    out.add(chrom, s, e)
        out.collapse()
        return out

    def total_size(self) -> int:
        if not self.collapsed:
            self.collapse()
        return sum(e - s for ivs in self.regions.values() for s, e in ivs)

    def __len__(self) -> int:
        return sum(len(v) for v in self.regions.values())
