"""JDBC road source — the PostGIS reader path
(road/PostGISReader.java:41-173, util/PostgresSource.java:30-95)
re-expressed as a Spark JDBC scan.

The reference opens a psql cursor over the ways table with two pushed
predicates: a polygon intersection on the geometry column and a
road-class exclusion list (PostGISReader.java:103-129). Spark-first,
both predicates belong INSIDE the JDBC subquery so the database —
which owns the spatial index — evaluates them, and the scan
parallelizes with partitionColumn bounds on gid: each executor reads
one gid range. The result schema matches roads.ROADS_SCHEMA, so
``RoadIndex`` and every downstream operator consume it unchanged.

The sandbox has no live Postgres, so tests cover the query/option
construction; ``.load()`` is the only call that needs a server.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def postgis_roads_query(table: str = "bfmap_ways",
                        polygon_wkt: str | None = None,
                        exclusions: dict | None = None) -> str:
    """The pushdown subquery (PostGISReader.java:102-129): geometry as
    WKB, exact polygon filter, per-class exclusions of the form
    {class_id: None (drop class) | max_speed (drop if slower)}.

    The polygon predicate is the reference's exact
    ``ST_Contains(poly, geom) OR ST_Overlaps(poly, geom)``
    (PostGISReader.java:102-105) — NOT a bare bbox intersection, which
    would load a superset (any road whose bounding box touches the
    polygon) and make downstream matches diverge from the reference.
    The ``geom && poly`` bbox test is kept only as an ANDed index
    prefilter so PostGIS hits the GiST index before evaluating the
    exact predicates (Contains/Overlaps imply bbox intersection, so
    the conjunction is semantically identical to the reference's)."""
    preds = []
    if polygon_wkt is not None:
        poly = f"ST_GeomFromText('{polygon_wkt}', 4326)"
        preds.append(
            f"(geom && {poly} AND (ST_Contains({poly},geom) "
            f"OR ST_Overlaps({poly},geom)))")
    for cls, speed in (exclusions or {}).items():
        if speed is None:
            preds.append(f"class_id <> {int(cls)}")
        else:
            preds.append(
                f"NOT (class_id = {int(cls)} AND "
                f"maxspeed_forward < {int(speed)})")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    return (f"(SELECT gid, osm_id, class_id, source, target, "
            f"length, reverse, maxspeed_forward, maxspeed_backward, "
            f"priority, ST_AsBinary(geom) AS geom FROM {table}{where}) "
            f"AS roads")


def postgis_roads_reader(spark: SparkSession, host: str, port: int,
                         database: str, user: str, password: str,
                         table: str = "bfmap_ways",
                         polygon_wkt: str | None = None,
                         exclusions: dict | None = None,
                         num_partitions: int = 32,
                         gid_upper: int | None = None):
    """Configured (lazy) JDBC reader: call ``.load()`` against a live
    PostGIS to get the roads DataFrame. Partitioned on gid so the scan
    runs num_partitions parallel cursors (PostgresSource opens one;
    this is the Spark-native scale-out of the same contract).

    gid_upper is REQUIRED and must be a realistic bound on max(gid)
    (e.g. ``SELECT max(gid)`` beforehand): Spark stripes partitions
    uniformly over [0, gid_upper], so a loose bound like 2^31 would put
    every real row into the first stripe and serialize the scan."""
    if gid_upper is None or gid_upper <= 0:
        raise ValueError("gid_upper must be a realistic max(gid) bound "
                         "(uniform stripes over [0, gid_upper])")
    return (spark.read.format("jdbc")
            .option("url", f"jdbc:postgresql://{host}:{port}/{database}")
            .option("user", user)
            .option("password", password)
            .option("driver", "org.postgresql.Driver")
            .option("dbtable",
                    postgis_roads_query(table, polygon_wkt, exclusions))
            .option("partitionColumn", "gid")
            .option("lowerBound", "0")
            .option("upperBound", str(int(gid_upper)))
            .option("numPartitions", str(int(num_partitions)))
            .option("fetchsize", "10000"))
