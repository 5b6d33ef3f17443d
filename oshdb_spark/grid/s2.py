"""Pure-numpy S2 cell ids (the north rule's "H3/S2" headline index).

Implements the public S2 geometry cell-id scheme from its published
specification (s2geometry.io/devguide/s2cell_hierarchy): lat/lng -> unit
sphere XYZ -> cube face + (u,v) -> quadratic (s,t) -> leaf (i,j) at
2^30 resolution -> 64-bit Hilbert-curve cell id.  No dependency — the
container has neither `h3` nor `s2`/`s2sphere`, and fixed-level cell
assignment needs only this math.  Everything is vectorized numpy over
flat coordinate arrays (the batched-UDF discipline of the north rule:
no per-row Python on the hot path).

Layout of a cell id (kFaceBits=3, kPosBits=61, kMaxLevel=30):

    id = face << 61 | curve_position | lsb
    lsb(level) = 1 << (2 * (30 - level))

A valid id at `level` has exactly its lsb as the lowest set bit; leaf
ids are odd.  The token form strips trailing zero nibbles from the hex.

The Hilbert traversal uses the standard 4-bit lookup tables generated
by the same recursive construction the spec describes (sub-cell visit
order per orientation + orientation transitions).  Correctness is
gated in tests/test_s2.py by structural invariants that pin the curve
exactly: FromFaceIJ/ToFaceIJ bit-exact round-trip, consecutive curve
positions land on 4-adjacent (i,j) cells (the defining Hilbert
property), face tokens, parent containment, and cross-checks of the
face/(u,v)/(s,t) math against closed-form fixed points.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1
LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2

# sub-cell (i,j) visit order for each of the 4 curve orientations, and the
# orientation adjustment each visit position applies — the canonical
# Hilbert construction constants from the S2 spec
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order: (0,0) (0,1) (1,1) (1,0)
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped + inverted
)
_POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)


def _build_lookups() -> tuple[np.ndarray, np.ndarray]:
    """4-bit-at-a-time Hilbert stepping tables.

    lookup_pos[(ij << 2) | orientation]  = (pos << 2) | new_orientation
    lookup_ij [(pos << 2) | orientation] = (ij << 2)  | new_orientation
    where ij packs 4 i-bits then 4 j-bits, pos packs 8 curve-position bits.
    """
    size = 1 << (2 * LOOKUP_BITS + 2)
    lookup_pos = np.zeros(size, dtype=np.uint64)
    lookup_ij = np.zeros(size, dtype=np.uint64)

    def init(level, i, j, orig_orientation, pos, orientation):
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            ij = r[index]
            init(
                level,
                i + (ij >> 1),
                j + (ij & 1),
                orig_orientation,
                pos + index,
                orientation ^ _POS_TO_ORIENTATION[index],
            )

    for orientation in range(4):
        init(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()


# ---------------------------------------------------------------------------
# lat/lng -> face, (s, t), (i, j)
# ---------------------------------------------------------------------------


def face_uv(lon_deg: np.ndarray, lat_deg: np.ndarray):
    """(face, u, v) per point — cube-face projection of the unit sphere."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    x = cos_lat * np.cos(lon)
    y = cos_lat * np.sin(lon)
    z = np.sin(lat)

    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest-component face: 0:+x 1:+y 2:+z 3:-x 4:-y 5:-z
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,  # face 5
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,  # face 5
        )
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """The S2_QUADRATIC_PROJECTION cell-area-equalizing transform."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def face_ij(lon_deg: np.ndarray, lat_deg: np.ndarray):
    """(face, i, j) leaf coordinates at 2^30 resolution."""
    face, u, v = face_uv(lon_deg, lat_deg)
    scale = float(1 << MAX_LEVEL)
    i = np.clip(np.floor(_uv_to_st(u) * scale), 0, scale - 1).astype(np.int64)
    j = np.clip(np.floor(_uv_to_st(v) * scale), 0, scale - 1).astype(np.int64)
    return face, i, j


# ---------------------------------------------------------------------------
# (face, i, j) <-> cell id along the Hilbert curve
# ---------------------------------------------------------------------------


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf (level-30) cell ids, vectorized 4 bits per step."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(POS_BITS - 1)
    bits = face & np.uint64(SWAP_MASK)
    mask = np.uint64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        sh = np.uint64(k * LOOKUP_BITS)
        bits += ((i >> sh) & mask) << np.uint64(LOOKUP_BITS + 2)
        bits += ((j >> sh) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return n * np.uint64(2) + np.uint64(1)


def to_face_ij(cell_id: np.ndarray):
    """Inverse of from_face_ij for leaf ids (face, i, j)."""
    ids = np.asarray(cell_id, dtype=np.uint64)
    face = (ids >> np.uint64(POS_BITS)).astype(np.int64)
    i = np.zeros_like(ids)
    j = np.zeros_like(ids)
    bits = (ids >> np.uint64(POS_BITS)) & np.uint64(SWAP_MASK)
    mask = np.uint64((1 << (2 * LOOKUP_BITS)) - 1)
    # the top chunk holds only 2 levels (60 = 7*8 + 4 position bits);
    # masking 8 bits there would pull the face field into the lookup
    top_mask = np.uint64((1 << (2 * (MAX_LEVEL - 7 * LOOKUP_BITS))) - 1)
    ij_mask = np.uint64((1 << LOOKUP_BITS) - 1)
    pos = ids >> np.uint64(1)  # strip the leaf lsb
    for k in range(7, -1, -1):
        sh = np.uint64(k * 2 * LOOKUP_BITS)
        bits += ((pos >> sh) & (top_mask if k == 7 else mask)) << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        ij = bits >> np.uint64(2)
        i |= (ij >> np.uint64(LOOKUP_BITS)) << np.uint64(k * LOOKUP_BITS)
        j |= (ij & ij_mask) << np.uint64(k * LOOKUP_BITS)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return face, i.astype(np.int64), j.astype(np.int64)


def parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor of (leaf or finer) ids at `level` — keeps the curve-position
    prefix, sets the level's lsb (id & -lsb | lsb)."""
    ids = np.asarray(cell_id, dtype=np.uint64)
    lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
    return (ids & (~(lsb - np.uint64(1)))) | lsb


def cell_id(lon_deg, lat_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """lat/lng (degrees) -> S2 cell id at `level`, fully vectorized."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face, i, j = face_ij(lon_deg, lat_deg)
    leaf = from_face_ij(face, i, j)
    if level == MAX_LEVEL:
        return leaf
    return parent(leaf, level)


def level_of(cell_id: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    ids = np.asarray(cell_id, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    # lsb = 2^(2*(30-level)) -> level = 30 - log2(lsb)/2
    log2 = np.zeros(ids.shape, dtype=np.int64)
    v = lsb.copy()
    for sh in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(sh))
        log2 += np.where(big, sh, 0)
        v = np.where(big, v >> np.uint64(sh), v)
    return MAX_LEVEL - log2 // 2


def token(cell_id: np.ndarray) -> list[str]:
    """Hex token: 16 nibbles with trailing zeros stripped ('X' for id 0)."""
    out = []
    for cid in np.asarray(cell_id, dtype=np.uint64):
        if cid == 0:
            out.append("X")
            continue
        h = format(int(cid), "016x").rstrip("0")
        out.append(h if h else "X")
    return out
