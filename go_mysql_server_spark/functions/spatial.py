"""Spatial st_* subset (reference sql/expression/function/spatial/*.go,
~80 functions; this implements the computational core without external geo
libraries — geometries are typed Spark values, not opaque blobs).

Representation (Spark-first, columnar-friendly):
- POINT        → struct<x:double, y:double>
- LINESTRING   → array<struct<x:double, y:double>>
- POLYGON ring → array<struct<x:double, y:double>> (closed: first == last)

WKT codecs (st_geomfromtext/st_astext) convert at the boundary; inside a
plan everything is arrays+structs, so distance/area/length/contains run as
whole-stage-codegen expressions over millions of rows with no UDF.
SRID handling: axis-order-free planar math + haversine for the sphere
variant (reference st_distance.go has the same split).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def point(x, y) -> Column:
    return F.struct(_c(x).cast("double").alias("x"), _c(y).cast("double").alias("y"))


def st_x(p) -> Column:
    return _c(p)["x"]


def st_y(p) -> Column:
    return _c(p)["y"]


def st_distance(a, b) -> Column:
    """Planar euclidean point distance (reference st_distance.go)."""
    a, b = _c(a), _c(b)
    dx, dy = a["x"] - b["x"], a["y"] - b["y"]
    return F.sqrt(dx * dx + dy * dy)


def st_distance_sphere(a, b, radius: float = 6370986.0) -> Column:
    """Haversine great-circle distance in meters; points are (lon, lat)
    degrees (MySQL default earth radius 6370986)."""
    a, b = _c(a), _c(b)
    lon1, lat1 = F.radians(a["x"]), F.radians(a["y"])
    lon2, lat2 = F.radians(b["x"]), F.radians(b["y"])
    dlat, dlon = lat2 - lat1, lon2 - lon1
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2 * radius) * F.asin(F.sqrt(h))


def st_length(line) -> Column:
    """Sum of segment lengths of a linestring."""
    line = _c(line)
    segs = F.zip_with(
        F.slice(line, 1, F.size(line) - 1),
        F.slice(line, 2, F.size(line) - 1),
        lambda p, q: F.sqrt(
            (p["x"] - q["x"]) * (p["x"] - q["x"])
            + (p["y"] - q["y"]) * (p["y"] - q["y"])
        ),
    )
    return F.aggregate(segs, F.lit(0.0), lambda acc, v: acc + v)


def st_area(ring) -> Column:
    """Polygon ring area via the shoelace formula (reference st_area.go)."""
    ring = _c(ring)
    cross = F.zip_with(
        F.slice(ring, 1, F.size(ring) - 1),
        F.slice(ring, 2, F.size(ring) - 1),
        lambda p, q: p["x"] * q["y"] - q["x"] * p["y"],
    )
    return F.abs(F.aggregate(cross, F.lit(0.0), lambda acc, v: acc + v)) / 2


def st_contains(ring, p) -> Column:
    """Point-in-polygon by ray casting: count edges crossing the horizontal
    ray from p; odd → inside. Pure expression (aggregate over edge pairs)."""
    ring, p = _c(ring), _c(p)
    px, py = p["x"], p["y"]
    crossings = F.zip_with(
        F.slice(ring, 1, F.size(ring) - 1),
        F.slice(ring, 2, F.size(ring) - 1),
        lambda a, b: F.when(
            ((a["y"] > py) != (b["y"] > py))
            & (px < (b["x"] - a["x"]) * (py - a["y"]) / (b["y"] - a["y"]) + a["x"]),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    total = F.aggregate(crossings, F.lit(0), lambda acc, v: acc + v)
    return (total % 2 == 1).cast("int")


def st_astext(geom, kind: str = "point") -> Column:
    """Struct/array geometry → WKT (reference geojson.go/wkt codecs)."""
    geom = _c(geom)
    if kind == "point":
        return F.concat(
            F.lit("POINT("),
            geom["x"].cast("string"), F.lit(" "), geom["y"].cast("string"),
            F.lit(")"),
        )
    body = F.array_join(
        F.transform(
            geom,
            lambda p: F.concat(p["x"].cast("string"), F.lit(" "),
                               p["y"].cast("string")),
        ),
        ",",
    )
    if kind == "linestring":
        return F.concat(F.lit("LINESTRING("), body, F.lit(")"))
    return F.concat(F.lit("POLYGON(("), body, F.lit("))"))


def st_geomfromtext(wkt) -> Column:
    """WKT POINT/LINESTRING/POLYGON → the typed representation.

    Returns the coordinate array; for POINT the single element. Parsing is
    regexp+split — expression-level, no UDF."""
    wkt = _c(wkt)
    coords = F.regexp_replace(wkt, r"^[A-Z ]+\(+|\)+$", "")
    pairs = F.split(coords, r"\s*,\s*")
    return F.transform(
        pairs,
        lambda s: F.struct(
            F.split(F.trim(s), r"\s+").getItem(0).cast("double").alias("x"),
            F.split(F.trim(s), r"\s+").getItem(1).cast("double").alias("y"),
        ),
    )


def st_srid(geom) -> Column:
    return F.lit(0)  # SRID 0 (planar); sphere math via st_distance_sphere


FUNCTIONS = {
    "point": point,
    "st_x": st_x,
    "st_y": st_y,
    "st_distance": st_distance,
    "st_distance_sphere": st_distance_sphere,
    "st_length": st_length,
    "st_area": st_area,
    "st_contains": st_contains,
    "st_astext": st_astext,
    "st_aswkt": st_astext,
    "st_geomfromtext": st_geomfromtext,
    "st_pointfromtext": lambda w: st_geomfromtext(w).getItem(0),
    "st_linestringfromtext": st_geomfromtext,
    "st_polygonfromtext": st_geomfromtext,
    "st_srid": st_srid,
}
