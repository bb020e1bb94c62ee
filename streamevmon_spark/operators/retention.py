"""Retention: age-out policy per rollup tier.

The rollup+downsample+retention triad's third leg: finer tiers keep a
short horizon, coarser tiers keep longer (or forever). In the target
Iceberg deployment this is a metadata-only ``DELETE WHERE ts <
cutoff`` on day-partitioned tables (partition drops, no data rewrite);
here the same policy is expressed as (a) a pure filter operator used by
queries and tests and (b) a partition-planning helper that enumerates
exactly the day partitions a maintenance job would drop.

``now`` is always an explicit argument — retention must be deterministic
and testable, never wall-clock-implicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default horizons (seconds); None = keep forever
DEFAULT_HORIZONS: dict[str, int | None] = {
    "raw": 30 * 86400,
    "1m": 90 * 86400,
    "1h": 2 * 365 * 86400,
    "1d": None,
}


def apply_retention(
    rolled: DataFrame,
    tier: str,
    now_ts: str,
    horizons: dict[str, int | None] | None = None,
    ts_col: str = "window_start",
) -> DataFrame:
    """Rows surviving retention: ``ts_col >= now - horizon[tier]``.
    A plain pushed-down predicate — on a day-partitioned table this
    prunes whole partitions at scan time."""
    horizon = (horizons or DEFAULT_HORIZONS).get(tier)
    if horizon is None:
        return rolled
    cutoff = F.expr(
        f"timestampadd(SECOND, {-int(horizon)}, "
        f"timestamp_ntz'{now_ts}')"
    )
    return rolled.where(F.col(ts_col) >= cutoff)


def expired_day_partitions(
    rolled: DataFrame,
    tier: str,
    now_ts: str,
    horizons: dict[str, int | None] | None = None,
    ts_col: str = "window_start",
) -> DataFrame:
    """The day partitions a maintenance job would drop (the Iceberg
    ``DELETE WHERE`` / partition-drop plan): distinct event-days strictly
    older than the horizon, with row counts for the manifest record."""
    horizon = (horizons or DEFAULT_HORIZONS).get(tier)
    if horizon is None:
        return rolled.select(
            F.to_date(ts_col).alias("day")
        ).where(F.lit(False)).groupBy("day").agg(
            F.count(F.lit(1)).alias("rows_dropped")
        )
    cutoff = F.expr(
        f"timestampadd(SECOND, {-int(horizon)}, timestamp_ntz'{now_ts}')"
    )
    return (
        rolled.where(F.col(ts_col) < cutoff)
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("rows_dropped"))
    )
