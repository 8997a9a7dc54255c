"""Spatial value decode: WKB -> the reference's GeoJSON string convention.

MySQL GEOMETRY columns arrive from the capture layer as a Debezium
``{wkb: bytes, srid: int32}`` struct; the reference converts them to a
GeoJSON string with an ``srid`` member folded in
(flink-connector-mysql-cdc/.../table/MySqlDeserializationConverterFactory
.java:80-112: ``OGCGeometry.fromBinary(wkb).asGeoJson()`` then re-emits
``{type, coordinates|geometries, srid}``). The type lattice already maps
GEOMETRY -> StringType (sources/types.py); this module supplies the
VALUE-level converter.

The parser implements OGC WKB (ISO 99-049 / OGC 06-103r4 well-known
binary): byte-order flag (0 = big-endian XDR, 1 = little-endian NDR),
uint32 geometry type, then the type-specific payload; nested geometries
(multi*/collection) each carry their own byte-order flag. EWKB's
embedded-SRID flag (bit 0x20000000, the PostGIS extension) is honored by
reading the uint32 SRID that follows the type word — Debezium sources
populate the struct's ``srid`` field instead, which takes precedence
when non-null.

Execution shape: an Arrow-batched pandas UDF — WKB blobs cross to Python
once per batch (zero-copy for the binary column) and the parse is a tight
``struct.unpack_from`` loop per value. At 100 TB this is a map-only
stage, no shuffle; geometry columns are rare enough in CDC streams that
the Python-worker hop on just that column is the right trade against
hand-writing a byte-twiddling JVM expression per geometry type.
"""

from __future__ import annotations

import json
import struct

# Module-level so the Arrow UDF's `pd.Series` type hints (strings under
# future-annotations) resolve against the function's globals.
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_NAMES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}

_EWKB_SRID_FLAG = 0x20000000
_WKB_Z_FLAG = 0x80000000  # unsupported here (MySQL geometries are 2D)


def _parse_geometry(buf: bytes, off: int):
    """Parse one WKB geometry at ``off``; returns (geojson_dict, new_off,
    embedded_srid_or_None). Raises ValueError on malformed input, matching
    the reference's loud IllegalArgumentException (:102-106)."""
    if off + 5 > len(buf):
        raise ValueError("truncated WKB header")
    bo = buf[off]
    if bo not in (0, 1):
        raise ValueError(f"bad WKB byte-order flag {bo}")
    e = "<" if bo == 1 else ">"
    (tword,) = struct.unpack_from(e + "I", buf, off + 1)
    off += 5
    srid = None
    if tword & _WKB_Z_FLAG:
        raise ValueError("Z/M WKB geometries unsupported (MySQL is 2D)")
    if tword & _EWKB_SRID_FLAG:
        (srid,) = struct.unpack_from(e + "I", buf, off)
        off += 4
        tword &= ~_EWKB_SRID_FLAG
    name = _TYPE_NAMES.get(tword)
    if name is None:
        raise ValueError(f"unknown WKB geometry type {tword}")

    def point(o):
        x, y = struct.unpack_from(e + "dd", buf, o)
        return [x, y], o + 16

    def ring(o):
        (n,) = struct.unpack_from(e + "I", buf, o)
        o += 4
        pts = []
        for _ in range(n):
            p, o = point(o)
            pts.append(p)
        return pts, o

    if name == "Point":
        coords, off = point(off)
    elif name == "LineString":
        coords, off = ring(off)
    elif name == "Polygon":
        (n,) = struct.unpack_from(e + "I", buf, off)
        off += 4
        coords = []
        for _ in range(n):
            r, off = ring(off)
            coords.append(r)
    else:  # multi*/collection: n embedded geometries, each with own header
        (n,) = struct.unpack_from(e + "I", buf, off)
        off += 4
        parts = []
        for _ in range(n):
            g, off, _ = _parse_geometry(buf, off)
            parts.append(g)
        if name == "GeometryCollection":
            return {"type": name, "geometries": parts}, off, srid
        # Multi* members must be the matching single type — a Point inside
        # a MultiLineString is corrupt WKB, rejected loudly (the reference's
        # OGCGeometry.fromBinary fails such blobs), never silently emitted
        # as wrong-shaped coordinates.
        member = name.removeprefix("Multi")
        bad = [g["type"] for g in parts if g["type"] != member]
        if bad:
            raise ValueError(f"{name} WKB contains non-{member} members: {bad}")
        coords = [g["coordinates"] for g in parts]
    return {"type": name, "coordinates": coords}, off, srid


def wkb_to_geojson(wkb: bytes, srid: int | None = None) -> str:
    """One WKB blob -> the reference's GeoJSON string: ``{type,
    coordinates|geometries, srid}`` with srid defaulting to 0
    (MySqlDeserializationConverterFactory.java:88-101 — the ``srid``
    member is the struct's value, ``Optional.orElse(0)``)."""
    try:
        geo, end, embedded = _parse_geometry(bytes(wkb), 0)
    except struct.error as exc:  # unpack past the buffer = truncated blob
        raise ValueError(f"truncated WKB geometry: {exc}") from exc
    if end != len(wkb):
        raise ValueError(f"{len(wkb) - end} trailing bytes after WKB geometry")
    geo["srid"] = int(srid) if srid is not None else (embedded or 0)
    return json.dumps(geo, separators=(",", ":"))


def geometry_to_geojson(wkb_col: Column | str, srid_col: Column | str | None = None) -> Column:
    """Column form of :func:`wkb_to_geojson` — Arrow-batched, null-safe.

    ``geometry_to_geojson(F.col("g.wkb"), F.col("g.srid"))`` is the decode
    the reference applies to every Point/Geometry-schema field
    (MySqlDeserializationConverterFactory.createStringConverter).
    """
    import sys

    from pyspark import cloudpickle
    from pyspark.sql.functions import pandas_udf

    # The UDF closure references this module's parser functions; without
    # this they pickle BY REFERENCE and executor Python workers launched
    # outside the repo (driver cwd elsewhere, no PYTHONPATH) fail with
    # ModuleNotFoundError — the same self-containment fix as
    # sources/datasource.py::register (ships the code inside the pickle).
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    @pandas_udf(T.StringType())
    def _decode(wkb: pd.Series, srid: pd.Series) -> pd.Series:
        out = []
        for b, s in zip(wkb, srid):
            if b is None:
                out.append(None)
            else:
                out.append(wkb_to_geojson(b, None if pd.isna(s) else int(s)))
        return pd.Series(out, dtype=object)

    srid_expr = F.lit(None).cast("int") if srid_col is None else F.col(srid_col) if isinstance(srid_col, str) else srid_col
    wkb_expr = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    return _decode(wkb_expr, srid_expr)
