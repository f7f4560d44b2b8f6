"""Translation between array index space and chunk index space.

Semantics-parity reimplementation of the reference's chunk-grid model
(``pangeo_forge_recipes/chunk_grid.py:19-254``), restructured around a single
vectorized bounds table per dimension instead of a per-axis class hierarchy.
Pure Python/numpy — reused verbatim inside Arrow-batched UDFs; carries no
distributed state.
"""

from __future__ import annotations

import warnings
from typing import Dict, FrozenSet, Set, Tuple

import numpy as np

from .utils import calc_subsets


class ChunkAxis:
    """One dimension's chunk layout: translate between array-index space and
    chunk-index space (reference ``chunk_grid.py:144-254``).

    Internally holds the exclusive prefix-sum ``bounds`` of the chunk
    lengths, so every translation is a ``searchsorted``.
    """

    __slots__ = ("chunks", "bounds")

    def __init__(self, chunks: Tuple[int, ...]):
        self.chunks = tuple(int(c) for c in chunks)
        self.bounds = np.concatenate([[0], np.cumsum(self.chunks)])

    def __eq__(self, other) -> bool:
        return isinstance(other, ChunkAxis) and self.chunks == other.chunks

    def __len__(self) -> int:
        return int(self.bounds[-1])

    @property
    def nchunks(self) -> int:
        return len(self.chunks)

    def subset(self, factor: int) -> "ChunkAxis":
        """Decimate every chunk into ``factor`` near-equal subsets
        (reference ``chunk_grid.py:165-169``)."""
        out: list = []
        for c in self.chunks:
            out.extend(calc_subsets(c, factor))
        return ChunkAxis(tuple(out))

    def consolidate(self, factor: int) -> "ChunkAxis":
        """Merge runs of ``factor`` adjacent chunks (reference
        ``chunk_grid.py:171-181``)."""
        out = [
            int(sum(self.chunks[i : i + factor]))
            for i in range(0, self.nchunks, factor)
        ]
        return ChunkAxis(tuple(out))

    def chunk_index_to_array_slice(self, chunk_index: int) -> slice:
        if not (0 <= chunk_index < self.nchunks):
            raise IndexError("chunk_index out of range")
        return slice(int(self.bounds[chunk_index]), int(self.bounds[chunk_index + 1]))

    def array_index_to_chunk_index(self, array_index: int) -> int:
        if not (0 <= array_index < len(self)):
            raise IndexError("Index out of range")
        return int(np.searchsorted(self.bounds, array_index, side="right")) - 1

    def array_slice_to_chunk_slice(self, sl: slice) -> slice:
        """Chunk-space slice covering every chunk that intersects ``sl``."""
        if sl.step not in (1, None):
            raise IndexError("Only works with step=1 or None")
        if sl.start < 0:
            raise IndexError("Slice start must be > 0")
        if sl.stop <= sl.start:
            raise IndexError("Stop must be greater than start")
        if sl.stop > len(self):
            raise IndexError(f"Stop must be <= than {len(self)}")
        first = int(np.searchsorted(self.bounds, sl.start, side="right")) - 1
        last = int(np.searchsorted(self.bounds, sl.stop, side="left"))
        return slice(first, last)

    def chunk_conflicts(self, chunk_index: int, other: "ChunkAxis") -> Set[int]:
        """Other-axis chunks that a write of ``chunk_index`` shares with
        neighboring chunks of this axis — the lock set for misaligned writes
        (reference ``chunk_grid.py:216-254``; designed-but-unused there, kept
        for parity). At most the two edge chunks can conflict.
        """
        if len(other) != len(self):
            raise ValueError("Can't compute conflict for ChunkAxes of different size.")
        conflicts: Set[int] = set()
        span = self.chunk_index_to_array_slice(chunk_index)
        touched = other.array_slice_to_chunk_slice(span)
        left, right = touched.start, touched.stop - 1
        if self.array_slice_to_chunk_slice(
            other.chunk_index_to_array_slice(left)
        ).start < chunk_index:
            conflicts.add(left)
        if self.array_slice_to_chunk_slice(
            other.chunk_index_to_array_slice(right)
        ).stop > chunk_index + 1:
            conflicts.add(right)
        return conflicts


class ChunkGrid:
    """Named collection of :class:`ChunkAxis` (reference
    ``chunk_grid.py:19-141``). Axis order is irrelevant."""

    def __init__(self, chunks: Dict[str, Tuple[int, ...]]):
        self.axes: Dict[str, ChunkAxis] = {
            name: ChunkAxis(c) for name, c in chunks.items()
        }

    def __eq__(self, other) -> bool:
        return isinstance(other, ChunkGrid) and self.axes == other.axes

    @classmethod
    def from_uniform_grid(cls, chunksize_and_dimsize: Dict[str, Tuple[int, int]]):
        """Uniform chunks (last may be ragged); reference
        ``chunk_grid.py:37-61`` including the oversize-chunk clamp warning."""
        all_chunks: Dict[str, Tuple[int, ...]] = {}
        for name, (chunksize, dimsize) in chunksize_and_dimsize.items():
            if dimsize <= 0:
                raise ValueError("dimsize must be greater than 0")
            if chunksize <= 0:
                raise ValueError("chunksize must be greater than 0")
            if chunksize > dimsize:
                warnings.warn(
                    f"chunksize ({chunksize}) > dimsize ({dimsize}). "
                    f"Decreasing chunksize to {dimsize}"
                )
                chunksize = dimsize
            n_full, rem = divmod(dimsize, chunksize)
            all_chunks[name] = n_full * (chunksize,) + ((rem,) if rem else ())
        return cls(all_chunks)

    @property
    def dims(self) -> FrozenSet[str]:
        return frozenset(self.axes)

    @property
    def shape(self) -> Dict[str, int]:
        return {name: len(ax) for name, ax in self.axes.items()}

    @property
    def nchunks(self) -> Dict[str, int]:
        return {name: ax.nchunks for name, ax in self.axes.items()}

    @property
    def ndim(self) -> int:
        return len(self.axes)

    def _mapped(self, method: str, per_dim: Dict, *extra) -> Dict:
        return {
            name: getattr(self.axes[name], method)(val, *extra)
            for name, val in per_dim.items()
        }

    def consolidate(self, factors: Dict[str, int]) -> "ChunkGrid":
        new = ChunkGrid({})
        new.axes = {
            name: ax.consolidate(factors[name]) if name in factors else ax
            for name, ax in self.axes.items()
        }
        return new

    def subset(self, factors: Dict[str, int]) -> "ChunkGrid":
        new = ChunkGrid({})
        new.axes = {
            name: ax.subset(factors[name]) if name in factors else ax
            for name, ax in self.axes.items()
        }
        return new

    def chunk_index_to_array_slice(self, chunk_index: Dict[str, int]) -> Dict[str, slice]:
        return self._mapped("chunk_index_to_array_slice", chunk_index)

    def array_index_to_chunk_index(self, array_index: Dict[str, int]) -> Dict[str, int]:
        return self._mapped("array_index_to_chunk_index", array_index)

    def array_slice_to_chunk_slice(self, array_slices: Dict[str, slice]) -> Dict[str, slice]:
        return self._mapped("array_slice_to_chunk_slice", array_slices)

    def chunk_conflicts(
        self, chunk_index: Dict[str, int], other: "ChunkGrid"
    ) -> Dict[str, Set[int]]:
        return {
            name: self.axes[name].chunk_conflicts(idx, other.axes[name])
            for name, idx in chunk_index.items()
        }
