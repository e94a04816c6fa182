"""Geospatial operators: haversine distance + nearest-site join.

The reference's only spatial logic is exact coordinate matching at 2-dp
(download_forecast.rs:1186-1218, J9) — enough when both sides share NOAA's
station registry. A weather engine over arbitrary points needs the general
form: for each point, the nearest station (site) by great-circle distance.

Scale shape: the site side is a REGISTRY (≈2,500 NOAA stations; ~100k for
any national sensor net) — always broadcastable. The join is therefore a
broadcast nested-loop over points × sites with an argmin, i.e. one pass
over the points with zero shuffle of the big side, followed by a per-point
aggregation that AQE executes as partial→final. Point sets of any size
stream through; it is the SITE side that must stay small. For
large × large NN (millions of sites) use the bucketed/IVF ANN path
(pipeline/similarity.py) on projected coordinates instead — same
cell-probe idea, spatial cells instead of centroid cells.

Distances are emitted as integer METERS (round half-up at the meter): trig
is IEEE double in both engines, so sub-millimeter ulp noise cannot move a
meter-rounded integer except on a razor-edge tie, and integer distances
keep the argmin tiebreak (min site id at equal distance) exact across
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.8  # IUGG mean radius


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in float meters (haversine; inputs degrees)."""
    dphi = F.radians(lat2 - lat1)
    dlam = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.pow(F.sin(dlam / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def nearest_site_join(
    points: DataFrame,
    sites: DataFrame,
    point_id: str = "point_id",
    site_id: str = "site_id",
    point_lat: str = "lat",
    point_lon: str = "lon",
    site_lat: str = "lat",
    site_lon: str = "lon",
) -> DataFrame:
    """For each point, the nearest site and its distance in meters:
    (point_id, nearest_site_id, distance_m). Ties (equal meter-rounded
    distance) break to the smallest site id — a total order, so results
    are deterministic and engine-independent.

    Single-pass argmin as ONE integer min: each candidate is packed into a
    long as `distance_m << 31 | dense_site_index` (max great-circle
    distance on Earth is ~2.0e7 m < 2^25, so 25 + 31 bits fit), where the
    dense index is `row_number` over the site registry ordered by id — so
    the integer min IS the lexicographic (distance, site_id) min for any
    orderable id type, with the tiebreak exact. A plain long min stays in
    whole-stage-codegen HashAggregate (a struct-min falls back to
    SortAggregate, which sorts the whole points×sites product — measured
    10× slower), the product is evaluated exactly once, and the partial
    aggregation collapses each partition to one candidate per point before
    the only shuffle. The packed index decodes back to the site id via a
    broadcast join against the (tiny) registry."""
    _IDX_BITS = 31
    w = Window.orderBy(F.col("_site_id").asc())
    # Single-partition window over the registry: fine by contract — the
    # site side must be broadcastable (≪ 2^31 rows) for this operator.
    site_map = (
        sites.select(
            F.col(site_id).alias("_site_id"),
            F.col(site_lat).alias("_slat"),
            F.col(site_lon).alias("_slon"),
        )
        .withColumn("_site_idx", F.row_number().over(w) - F.lit(1))
    )
    p = points.select(
        F.col(point_id).alias("_point_id"),
        F.col(point_lat).alias("_plat"),
        F.col(point_lon).alias("_plon"),
    )
    # The NL-join stage's parallelism is the points side's partitioning; a
    # small/compacted scan (few files) would serialize |points|×|sites|
    # haversines onto a few cores. Compute dominates a round-robin shuffle
    # of the 3-column points rows by orders of magnitude, so widen when
    # under-partitioned; at real scale the scan already has enough splits
    # and this branch is a no-op.
    target = points.sparkSession.sparkContext.defaultParallelism
    if p.rdd.getNumPartitions() < target:
        p = p.repartition(target)
    dist = F.round(
        haversine_m(
            F.col("_plat"), F.col("_plon"), F.col("_slat"), F.col("_slon")
        )
    ).cast("long")
    packed = F.shiftleft(dist, _IDX_BITS) + F.col("_site_idx")
    best = (
        p.crossJoin(F.broadcast(site_map))
        .select("_point_id", packed.alias("_packed"))
        .groupBy("_point_id")
        .agg(F.min("_packed").alias("_packed"))
        .select(
            "_point_id",
            F.shiftright(F.col("_packed"), _IDX_BITS).alias("distance_m"),
            (
                F.col("_packed")
                - F.shiftleft(
                    F.shiftright(F.col("_packed"), _IDX_BITS), _IDX_BITS
                )
            ).alias("_site_idx"),
        )
    )
    return best.join(
        F.broadcast(site_map.select("_site_idx", "_site_id")), "_site_idx"
    ).select(
        F.col("_point_id").alias(point_id),
        F.col("_site_id").alias("nearest_site_id"),
        "distance_m",
    )
