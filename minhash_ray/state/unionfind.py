"""Union-find (disjoint set) with min-representative tracking.

Driver-side connected components for bounded edge sets; the distributed
label-propagation path lives in ``minhash_ray.stages.cluster``.  Canonical
cluster id = lexicographic min clip_id of the component (clip ids are
zero-padded, so lexicographic == numeric order).
"""

from __future__ import annotations


class UnionFind:
    __slots__ = ("parent", "rank")

    def __init__(self):
        self.parent: dict[str, str] = {}
        self.rank: dict[str, int] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            self.rank[x] = 0
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:          # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1

    def components(self) -> dict[str, str]:
        """node → min member of its component."""
        root_min: dict[str, str] = {}
        for node in self.parent:
            r = self.find(node)
            cur = root_min.get(r)
            if cur is None or node < cur:
                root_min[r] = node
        return {node: root_min[self.find(node)] for node in self.parent}
