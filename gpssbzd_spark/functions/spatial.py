"""Z-order (Morton) spatial clustering — native bit ops, no UDFs.

The reference partitions GPS work by bus line (`Parallel/Trajectory
Clustering.py:293-316`), which co-locates a LINE's points but scatters
a GEOGRAPHIC region across files — a "what happened near this tunnel"
query must scan everything. The standard lakehouse answer is Z-ORDER
file layout: interleave the bits of the quantized (lat, lng) cell
coordinates into one Morton code, range-partition + sort the write by
that code, and parquet min/max footer stats turn any bounding-box
predicate into file skipping (both dimensions stay correlated with the
sort key, which a plain `ORDER BY lat, lng` cannot do for lng).

Everything here is integer arithmetic on BIGINTs built from
`shiftleft`/`bitwiseOR`/`bitwiseAND` — whole-stage codegen'd, and
bit-identical in any engine with 64-bit integer ops (the corpus oracle
evaluates the same expression in DuckDB). The bit-spreading uses the
classic magic-number masks (public domain, e.g. "Bit Twiddling Hacks"):
5 mask-and-shift steps instead of 16 per-bit terms.

At 100 TB: the z-value is a stateless per-row projection; the layout
write is one range exchange (`repartitionByRange` samples the z
distribution, so files get balanced row counts even when the fleet
clusters downtown). Readers prune on footer stats — no index service,
no clustering metadata beyond parquet itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per dimension → 32-bit Morton codes in a BIGINT
_CELLS = (1 << BITS) - 1  # 65535

# magic-number spreading: 16-bit value → its bits at even positions of
# a 32-bit word. (mask after shifting by 8, 4, 2, 1.)
_SPREAD_STEPS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def quantize_cell(v: Column, lo: float, hi: float, bits: int = BITS) -> Column:
    """Map a coordinate in [lo, hi] to an integer cell in [0, 2^bits-1].

    Out-of-range values clamp to the edge cells (a point slightly past
    the configured extent should land in the border file, not crash or
    wrap). Identical IEEE-double arithmetic on both engines.
    """
    cells = (1 << bits) - 1
    scaled = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(cells + 1)))
    return F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.lit(cells).cast("bigint"), scaled.cast("bigint")),
    )


def quantize_cell_sql(expr: str, lo: float, hi: float, bits: int = BITS) -> str:
    """DuckDB/ANSI twin of :func:`quantize_cell`."""
    cells = (1 << bits) - 1
    scaled = (
        f"CAST(floor(({expr} - {lo!r}) / {hi - lo!r} * {float(cells + 1)!r}) "
        f"AS BIGINT)"
    )
    return f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST({cells} AS BIGINT), {scaled}))"


def _spread(c: Column) -> Column:
    for shift, mask in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def _spread_sql(e: str) -> str:
    for shift, mask in _SPREAD_STEPS:
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


def morton2(x_cell: Column, y_cell: Column) -> Column:
    """Interleave two 16-bit cell coordinates into one Morton code:
    x's bits at even positions, y's at odd. Monotone in each dimension
    when the other is fixed, and contiguous code ranges are compact
    rectangles — the property file skipping relies on."""
    return _spread(x_cell).bitwiseOR(F.shiftleft(_spread(y_cell), 1))


def morton2_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB/ANSI twin of :func:`morton2`."""
    return f"({_spread_sql(x_expr)} | ({_spread_sql(y_expr)} << 1))"


def zorder_value(
    lat: Column,
    lng: Column,
    lat_range: tuple[float, float],
    lng_range: tuple[float, float],
    bits: int = BITS,
) -> Column:
    """Morton code for a (lat, lng) point over the given extents."""
    return morton2(
        quantize_cell(lat, *lat_range, bits=bits),
        quantize_cell(lng, *lng_range, bits=bits),
    )


def zorder_value_sql(
    lat_expr: str,
    lng_expr: str,
    lat_range: tuple[float, float],
    lng_range: tuple[float, float],
    bits: int = BITS,
) -> str:
    return morton2_sql(
        quantize_cell_sql(lat_expr, *lat_range, bits=bits),
        quantize_cell_sql(lng_expr, *lng_range, bits=bits),
    )


def zorder_layout(
    df: DataFrame,
    lat_col: str,
    lng_col: str,
    lat_range: tuple[float, float],
    lng_range: tuple[float, float],
    num_files: int,
    z_col: str = "zval",
) -> DataFrame:
    """Cluster a DataFrame for write: compute the z-value, range-
    partition on it (`repartitionByRange` samples the distribution, so
    partitions carry balanced ROW counts even under geographic skew)
    and sort within partitions, so every output file covers a compact
    z-range and its parquet footer min/max on BOTH `lat_col` and
    `lng_col` are tight. Feed straight to a writer::

        zorder_layout(df, "lat", "lng", (22, 23), (113, 115), 64)
            .write.parquet(path)
    """
    z = zorder_value(
        F.col(lat_col), F.col(lng_col), lat_range, lng_range
    ).alias(z_col)
    return (
        df.select("*", z)
        .repartitionByRange(num_files, z_col)
        .sortWithinPartitions(z_col)
    )
