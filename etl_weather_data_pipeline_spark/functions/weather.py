"""Weather-domain scalar expressions (SURVEY §2.6, E1-E23).

The reference implements these as vectorized pandas ops plus four
row-at-a-time ``Series.apply`` bucketing functions
(reference src/transform.py:125-299). Here every one is a pure Catalyst
Column expression — ``when``-chains instead of Python UDFs — so they stay
inside whole-stage codegen and cost nothing extra at 100 TB.

Engine semantics are **Spark semantics** (SURVEY §7.3): HALF_UP rounding,
``pmod`` for modulo (non-negative result, matching pandas), ``initcap``
for title-casing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Text normalization (E1-E3; reference src/transform.py:98-100)
# ---------------------------------------------------------------------------


def clean_city(col: Column) -> Column:
    """Trim + title-case (E1)."""
    return F.initcap(F.trim(col))


def clean_country(col: Column) -> Column:
    """Uppercase ISO-2 (E2)."""
    return F.upper(F.trim(col))


def clean_description(col: Column) -> Column:
    """Lowercase + trim free text (E3)."""
    return F.lower(F.trim(col))


# ---------------------------------------------------------------------------
# Numeric normalization (E4-E7; reference src/transform.py:132-149)
# ---------------------------------------------------------------------------


def clip(col: Column, lo: float | None = None, hi: float | None = None) -> Column:
    """Clip to [lo, hi] via least/greatest (E4, E6)."""
    out = col
    if lo is not None:
        out = F.greatest(out, F.lit(lo))
    if hi is not None:
        out = F.least(out, F.lit(hi))
    return out


def wrap_degrees(col: Column, period: int = 360) -> Column:
    """Python-style modulo: result >= 0 even for negative input (E5).

    ``pmod``, not ``%`` — Spark's ``%`` keeps the sign of the dividend,
    pandas' does not (reference src/transform.py:138).
    """
    return F.pmod(col, F.lit(period))


def round_to(col: Column, scale: int) -> Column:
    """HALF_UP rounding at ``scale`` decimals (E7).

    Routed through DECIMAL(28,10): plain ``F.round`` on doubles decides
    ties from the shortest decimal repr while other engines round the
    binary value — they disagree on values like 9.65. The decimal route is
    bit-identical across Spark/DuckDB (verified incl. negatives) and keeps
    HALF_UP semantics; SQL mirror:
    ``CAST(ROUND(CAST(x AS DECIMAL(28,10)), n) AS DOUBLE)``.
    """
    return F.round(col.cast("decimal(28,10)"), scale).cast("double")


# ---------------------------------------------------------------------------
# Date/time derivations (E8-E12; reference src/transform.py:160-164)
# ---------------------------------------------------------------------------


def obs_date(ts: Column) -> Column:
    return F.to_date(ts)


def obs_hour(ts: Column) -> Column:
    return F.hour(ts)


def day_name(ts: Column) -> Column:
    """Full weekday name, e.g. 'Tuesday' (E10)."""
    return F.date_format(ts, "EEEE")


def month_name(ts: Column) -> Column:
    """Full month name, e.g. 'November' (E11)."""
    return F.date_format(ts, "MMMM")


def season(ts: Column) -> Column:
    """Northern-hemisphere meteorological season from month (E12;
    reference src/transform.py:218-227)."""
    m = F.month(ts)
    return (
        F.when(m.isin(12, 1, 2), "Winter")
        .when(m.isin(3, 4, 5), "Spring")
        .when(m.isin(6, 7, 8), "Summer")
        .otherwise("Autumn")
    )


# ---------------------------------------------------------------------------
# Bucketing when-chains (E13-E15; reference src/transform.py:229-268 —
# Series.apply in the reference, pure Catalyst expressions here)
# ---------------------------------------------------------------------------


def temp_category(t: Column) -> Column:
    """6 buckets (reference src/transform.py:229-242)."""
    return (
        F.when(t < 0, "Freezing")
        .when(t < 10, "Cold")
        .when(t < 20, "Cool")
        .when(t < 25, "Mild")
        .when(t < 30, "Warm")
        .otherwise("Hot")
    )


def humidity_category(h: Column) -> Column:
    """3 buckets (reference src/transform.py:244-251)."""
    return F.when(h < 30, "Low").when(h < 60, "Moderate").otherwise("High")


def wind_category(ws: Column) -> Column:
    """7 Beaufort-ish buckets (reference src/transform.py:253-268)."""
    return (
        F.when(ws < 1, "Calm")
        .when(ws < 6, "Light")
        .when(ws < 12, "Gentle")
        .when(ws < 20, "Moderate")
        .when(ws < 29, "Fresh")
        .when(ws < 39, "Strong")
        .otherwise("Gale")
    )


# ---------------------------------------------------------------------------
# Derived measures (E16-E19; reference src/transform.py:270-299)
# ---------------------------------------------------------------------------


def comfort_index(t: Column, h: Column) -> Column:
    """Piecewise humidity-adjusted temperature, 1dp (E16;
    reference src/transform.py:270-282)."""
    adjusted = (
        F.when(h > 70, t + (h - F.lit(70)) * F.lit(0.1))
        .when(h < 30, t - (F.lit(30) - h) * F.lit(0.05))
        .otherwise(t)
    )
    return round_to(adjusted, 1)


def location(city: Column, country: Column) -> Column:
    """'City, CC' display string (E17)."""
    return F.concat_ws(", ", city, country)


def coord_string(lat: Column, lon: Column) -> Column:
    """'lat,lon' string from numeric coordinates (E18)."""
    return F.concat(lat.cast("string"), F.lit(","), lon.cast("string"))


def quality_score(
    t: Column, ws: Column, vis: Column
) -> Column:
    """Heuristic 0-100 data-quality score (E19;
    reference src/transform.py:284-299): start at 100, subtract fixed
    penalties for suspicious measurements, clip to [0, 100]."""
    penalty = (
        F.when(ws.isNull(), 5).otherwise(0)
        + F.when(vis == 0, 3).otherwise(0)
        + F.when(t > 45, 5).otherwise(0)
        + F.when(t < -30, 5).otherwise(0)
        + F.when(ws > 100, 10).otherwise(0)
    )
    return clip(F.lit(100) - penalty, 0, 100).cast("double")
