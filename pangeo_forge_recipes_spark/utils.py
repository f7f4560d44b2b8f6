"""Small scalar helpers (reference ``pangeo_forge_recipes/utils.py:1-8``)."""

from __future__ import annotations


def calc_subsets(length: int, n_segments: int) -> list:
    """Partition an integer ``length`` into ``n_segments`` near-equal integer
    segments; the remainder goes to the last segment (reference
    ``utils.py:1-8``)."""
    if n_segments > length:
        raise ValueError(f"Can't split {length} into {n_segments} segments")
    base, rem = divmod(length, n_segments)
    return (n_segments - 1) * [base] + [base + rem]
