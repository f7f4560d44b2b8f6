"""Core index types for the PySpark-native pangeo-forge engine.

Fresh implementation of the index/address model described by the reference
(``pangeo_forge_recipes/types.py:6-86``): every element flowing through a
pipeline is addressed by an :class:`Index` — a mapping from a combine
:class:`Dimension` to a :class:`Position` within that dimension.

Spark-first differences from the reference:

* ``Index`` round-trips to a *canonical JSON string* so it can live in a
  plain ``StringType`` DataFrame column and serve as a groupBy / join key
  without custom encoders. Canonical = dimensions sorted by name, fixed
  field order — equal indexes always serialize to byte-identical strings.
* No Beam type hints; these are plain frozen dataclasses usable inside
  Arrow-batched UDFs.
"""

from __future__ import annotations

import enum
import json
from dataclasses import dataclass, field, replace
from typing import Dict, Optional, Tuple, TypeVar

T = TypeVar("T")


class CombineOp(enum.Enum):
    """How a dimension combines files (reference ``types.py:6-11``).

    MERGE unions distinct variables; CONCAT stacks the same variables along
    an axis; SUBSET is retained for enum parity but — as in the reference —
    never produced by any pattern.
    """

    MERGE = 1
    CONCAT = 2
    SUBSET = 3


@dataclass(frozen=True, order=True)
class Dimension:
    """A named combine axis: ``(name, operation)`` (reference ``types.py:14-22``)."""

    name: str
    operation: CombineOp

    def to_json_obj(self) -> dict:
        return {"name": self.name, "operation": self.operation.name}

    @classmethod
    def from_json_obj(cls, obj: dict) -> "Dimension":
        return cls(obj["name"], CombineOp[obj["operation"]])


@dataclass(frozen=True)
class Position:
    """Position of one file along a dimension (reference ``types.py:25-32``).

    ``value`` is the *sequence* position (which file) until indexed; see
    :class:`IndexedPosition` for element offsets.
    """

    value: int
    # mirrors the reference's ``indexed`` discriminator
    indexed: bool = field(default=False)

    def to_json_obj(self) -> dict:
        return {"value": int(self.value), "indexed": False}


@dataclass(frozen=True)
class IndexedPosition(Position):
    """Position enriched with the element-space start offset and the global
    dimension size (reference ``types.py:35-40``). ``value`` becomes the
    array offset of this fragment's first element along the dimension.
    """

    indexed: bool = field(default=True)
    dimsize: int = 0

    def to_json_obj(self) -> dict:
        return {"value": int(self.value), "indexed": True, "dimsize": int(self.dimsize)}


def _position_from_json_obj(obj: dict) -> Position:
    if obj.get("indexed"):
        return IndexedPosition(value=obj["value"], dimsize=obj.get("dimsize", 0))
    return Position(value=obj["value"])


class Index(Dict[Dimension, Position]):
    """Deterministically serializable address of a fragment within the global
    hypercube (reference ``types.py:43-81``): dict of Dimension -> Position,
    hashable, with a canonical JSON form for DataFrame keying.
    """

    def __hash__(self) -> int:  # type: ignore[override]
        return hash(self.to_json())

    def __eq__(self, other) -> bool:
        if not isinstance(other, dict):
            return NotImplemented
        return dict(self) == dict(other)

    def find_concat_dim(self, dim_name: str) -> Optional[Dimension]:
        """Reference ``types.py:62-71``: locate the CONCAT dimension named
        ``dim_name``, or None."""
        possible = [
            d for d in self if d.name == dim_name and d.operation == CombineOp.CONCAT
        ]
        if len(possible) > 1:
            raise ValueError(f"Found multiple concat dims named {dim_name} in {self}")
        return possible[0] if possible else None

    # -- canonical serialization ------------------------------------------------
    def to_json(self) -> str:
        items = sorted(
            (
                (d.name, d.operation.name, p.to_json_obj())
                for d, p in self.items()
            ),
        )
        return json.dumps(
            [{"dim": n, "op": o, "pos": p} for n, o, p in items],
            separators=(",", ":"),
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "Index":
        out = cls()
        for ent in json.loads(s):
            out[Dimension(ent["dim"], CombineOp[ent["op"]])] = _position_from_json_obj(
                ent["pos"]
            )
        return out

    def with_position(self, dim: Dimension, pos: Position) -> "Index":
        new = Index(self)
        new[dim] = pos
        return new


Indexed = Tuple[Index, T]


def augment_index_with_start_stop(
    position: Position,
    item_lens: list,
    append_offset: int = 0,
) -> IndexedPosition:
    """Convert a sequence position into an element-space offset via prefix sum
    (reference ``patterns.py:66-82``), honoring an append offset for
    append-mode runs (reference ``transforms.py:700``).
    """
    if position.indexed:
        raise ValueError("This position is already indexed")
    start = sum(item_lens[: position.value]) + append_offset
    dimsize = sum(item_lens) + append_offset
    return IndexedPosition(value=start, dimsize=dimsize)


__all__ = [
    "CombineOp",
    "Dimension",
    "Position",
    "IndexedPosition",
    "Index",
    "Indexed",
    "augment_index_with_start_stop",
    "replace",
]
