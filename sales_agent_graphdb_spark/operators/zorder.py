"""Z-order (Morton) clustering for multi-column data skipping.

s10_sorted_scan_pruning proves 1-D clustering: sort the fact table by
one column and parquet min/max stats skip row groups for filters on
it. A filter on a SECOND column gains nothing from that layout — its
values are shuffled uniformly through every row group. Z-ordering
interleaves the bits of two (or more) columns into one sort key, so
proximity in the key implies proximity in EVERY interleaved dimension:
each row group then covers a small box in (a, b) space and min/max
stats skip on filters over either column or both. This is the
standard lakehouse technique for multi-dimensional pruning (e.g.
Delta Lake's OPTIMIZE ZORDER BY, Hudi/Iceberg z-order clustering).

The z-value is a pure codegen'd projection (a fixed chain of
shift/and/or terms — no UDF), used only as a write-time sort key; it
never needs to be unique or exact, so masking to ``bits`` low-order
bits per dimension is safe (keys above the mask just share a cluster).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integral columns: bit j of ``a`` lands at position 2j, bit j of
    ``b`` at 2j+1. One flat expression of 2*bits shift/and/or terms —
    whole-stage-codegen folds it into straight-line long arithmetic."""
    if not (1 <= bits <= 31):
        raise ValueError(f"zvalue: bits must be in [1, 31], got {bits}")
    al, bl = a.cast("long"), b.cast("long")
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(al, j).bitwiseAND(F.lit(1)), 2 * j)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(bl, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        )
    return out


def zvalue_scaled(
    a: Column, b: Column, a_max: int, b_max: int, bits: int = 8
) -> Column:
    """Morton interleave with per-dimension NORMALIZATION: each value is
    first scaled to the common ``bits``-wide range as
    ``floor(v * 2^bits / (max + 1))`` — double division then floor,
    which equals the integer quotient while ``v * 2^bits`` stays
    inside 2^53 (any key below ~2^45 at the default bits=8); beyond
    that the rounded quotient can only blur a cluster boundary, never
    correctness, because the z-value is purely a sort key. Required
    whenever the dimensions have different magnitudes — interleaving
    raw bits of a 15-bit key with a 4-bit key leaves the wide key's
    high bits dominating the sort order and the narrow dimension
    unclustered. Production z-order implementations normalize the same
    way (per-column range/rank ids, e.g. Delta's OPTIMIZE ZORDER BY);
    a linear max-scale is the stateless form and is exact for the
    clustering purpose (collisions only merge adjacent clusters)."""
    if a_max < 0 or b_max < 0:
        raise ValueError("zvalue_scaled: maxima must be non-negative")
    scale = 1 << bits
    an = (a.cast("long") * scale) / F.lit(a_max + 1)
    bn = (b.cast("long") * scale) / F.lit(b_max + 1)
    return zvalue(F.floor(an), F.floor(bn), bits=bits)
