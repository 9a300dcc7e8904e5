"""Poseidon Merkle trees with caps, vectorized over all nodes per level.

TPU-native analog of the reference's external plonky2 Merkle commitment
(SURVEY.md §2.3, "LDE + Merkle commitment"): leaf hashing is one batched
Poseidon sponge over every row of the LDE matrix at once, and each tree
level is one batched two_to_one compression — pure VPU work with static
shapes.  A *cap* of 2^cap_height roots is kept (like plonky2's MerkleCap)
so multi-chip builds can hash sub-trees locally and only exchange caps.
"""

from __future__ import annotations

import numpy as np

from ..field.poseidon import hash_no_pad_ints, two_to_one_ints, DIGEST


class MerkleTree:
    """Committed matrix + digest levels (device-resident backend arrays).

    levels[0] = leaf digests, levels[-1] = cap; each level is a stacked
    (lo, hi) pair of shape (DIGEST, size).
    """

    def __init__(self, G, leaves_lo, leaves_hi, levels, cap_height):
        self.G = G
        self.leaves_lo = leaves_lo  # (M, C) uint32
        self.leaves_hi = leaves_hi
        self.levels = levels
        self.cap_height = cap_height
        self._host_levels = None

    @property
    def num_leaves(self):
        return self.leaves_lo.shape[0]

    def cap_u64(self):
        """Cap digests as host numpy uint64 (cap_size, DIGEST)."""
        lo, hi = self.levels[-1]
        return np.asarray(self.G.to_u64((lo, hi))).T

    def rows_u64(self, indices):
        """Gather leaf rows for many indices in one device op + transfer:
        (len(indices), C) uint64."""
        G = self.G
        idx = G.xp.asarray(np.asarray(indices, dtype=np.int32))
        lo = G.xp.take(self.leaves_lo, idx, axis=0)
        hi = G.xp.take(self.leaves_hi, idx, axis=0)
        return np.asarray(G.to_u64((lo, hi)))

    def open_row(self, index: int):
        """Merkle path for leaf `index`: (leaf_values_u64, path) where path is
        a list of sibling digests (uint64[DIGEST]) from leaf level up to cap."""
        row = self.rows_u64([index])[0]
        return row, self.paths_for([index])[0]

    def paths_for(self, indices):
        """Merkle paths for many leaves: one batched device gather per level,
        ONE device->host transfer total (the chip may sit behind a network
        tunnel, so round trips — not bytes — dominate query assembly)."""
        G = self.G
        xp = G.xp
        cur = np.asarray(indices, dtype=np.int64)
        gathered = []
        for lo, hi in self.levels[:-1]:
            sib = xp.asarray((cur ^ 1).astype(np.int32))
            gathered.append((xp.take(lo, sib, axis=1), xp.take(hi, sib, axis=1)))
            cur >>= 1
        if not gathered:
            return [[] for _ in indices]
        cat_lo = xp.concatenate([g[0] for g in gathered], axis=0)  # (4*L, Q)
        cat_hi = xp.concatenate([g[1] for g in gathered], axis=0)
        flat = np.asarray(G.to_u64((cat_lo, cat_hi)))
        nlev = len(gathered)
        return [[flat[4 * l:4 * (l + 1), q] for l in range(nlev)]
                for q in range(len(indices))]


def merkle_commit(G, H, matrix, cap_height: int) -> MerkleTree:
    """Commit to a (M, C) matrix of field values ((lo, hi) uint32 arrays).

    Leaf i hashes row i (all C values); levels are built until 2^cap_height
    nodes remain.
    """
    lo, hi = matrix
    m, c = lo.shape
    log_m = int(m).bit_length() - 1
    assert (1 << log_m) == m
    assert cap_height <= log_m
    digest = H.hash_no_pad((lo.T, hi.T))  # stacked (DIGEST, M)
    levels = [digest]
    cur = digest
    size = m
    while size > (1 << cap_height):
        left = (cur[0][:, 0::2], cur[1][:, 0::2])
        right = (cur[0][:, 1::2], cur[1][:, 1::2])
        cur = H.two_to_one(left, right)
        levels.append(cur)
        size >>= 1
    return MerkleTree(G, lo, hi, levels, cap_height)


def verify_merkle_path(leaf_values_u64, index: int, path, cap_u64) -> bool:
    """Check a Merkle path against a cap (host side, scalar Poseidon).

    NB: no np.asarray on python-int inputs — numpy 2.x silently coerces
    ints >= 2^63 to float64, corrupting field elements."""
    node = hash_no_pad_ints([int(v) for v in leaf_values_u64])
    idx = index
    for sib in path:
        s = tuple(int(x) for x in sib)
        node = two_to_one_ints(s, node) if (idx & 1) else two_to_one_ints(node, s)
        idx >>= 1
    expect = tuple(int(x) for x in cap_u64[idx])
    return node == expect
