"""Property-based round-trips for the format drivers' serialization
kernels (no SparkSession — these exercise the pure codecs, so hypothesis
can run hundreds of examples):

- FlatGeobuf: WKB -> flatbuffer Geometry table -> WKB, plus the
  properties blob for every fixed-width + varlen column type;
- KML: WKB -> Placemark XML -> WKB (repr round-trip keeps doubles exact);
- GeoJSON: WKB -> geojson dict -> WKB;
- WKT: WKB -> text -> WKB.

Serialization must round-trip ANY coordinates — geometric validity is a
different contract — so rings here are arbitrary point sequences.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from gdal_spark import geom

finite = st.floats(
    min_value=-1e15, max_value=1e15,
    allow_nan=False, allow_infinity=False,
)
point = st.tuples(finite, finite)


def _ring(pts):
    a = np.asarray(pts, dtype=np.float64)
    return np.vstack([a, a[:1]])  # closed


rings = st.lists(point, min_size=3, max_size=8).map(_ring)


@st.composite
def geometries(draw):
    kind = draw(st.sampled_from(["point", "line", "poly", "mpoly"]))
    if kind == "point":
        x, y = draw(point)
        return geom.wkb_point(x, y)
    if kind == "line":
        pts = draw(st.lists(point, min_size=2, max_size=10))
        return geom.wkb_linestring(np.asarray(pts, dtype=np.float64))
    if kind == "poly":
        rs = draw(st.lists(rings, min_size=1, max_size=3))
        return geom.wkb_polygon(rs)
    polys = draw(
        st.lists(st.lists(rings, min_size=1, max_size=2), min_size=1,
                 max_size=3)
    )
    return geom.wkb_multipolygon(polys)


def _coords_of(wkb):
    g = geom.parse_wkb(bytes(wkb))
    from gdal_spark.geom import _iter_coords

    return [np.asarray(c, dtype=np.float64) for c in _iter_coords(g)]


def _assert_same(wa, wb, exact=True):
    ga, gb = geom.parse_wkb(bytes(wa)), geom.parse_wkb(bytes(wb))
    assert ga.kind == gb.kind
    ca, cb = _coords_of(wa), _coords_of(wb)
    assert len(ca) == len(cb)
    for a, b in zip(ca, cb):
        a2, b2 = np.atleast_2d(a), np.atleast_2d(b)
        assert a2.shape == b2.shape
        if exact:
            np.testing.assert_array_equal(a2, b2)
        else:
            np.testing.assert_allclose(a2, b2, rtol=0, atol=0)


class TestFlatGeobufProperties:
    @settings(max_examples=150, deadline=None)
    @given(geometries())
    def test_geometry_roundtrip(self, wkb):
        from gdal_spark.formats.flatgeobuf import (
            _Builder, _geom_fields, _indirect, _read_geometry, _root,
            _field, _F_GEOMETRY,
        )

        fb = _Builder()
        g = geom.parse_wkb(bytes(wkb))
        fields, gt = _geom_fields(fb, g)
        goff = fb.table(fields)
        root = fb.table([(_F_GEOMETRY, "off", goff)])
        buf = fb.finish_size_prefixed(root)[4:]  # drop size prefix
        t = _root(buf)
        back = _read_geometry(buf, _indirect(buf, t + _field(buf, t, _F_GEOMETRY)), 0)
        _assert_same(wkb, back)
        del gt

    @settings(max_examples=100, deadline=None)
    @given(
        st.booleans(),
        st.integers(-2**31, 2**31 - 1),
        st.integers(-2**63, 2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=40),
        st.binary(max_size=40),
    )
    def test_properties_roundtrip(self, b, i, l_, d, s, raw):
        from gdal_spark.formats.flatgeobuf import (
            CT_BOOL, CT_INT, CT_LONG, CT_DOUBLE, CT_STRING, CT_BINARY,
            _decode_props, _encode_props,
        )

        cols = [("b", CT_BOOL), ("i", CT_INT), ("l", CT_LONG),
                ("d", CT_DOUBLE), ("s", CT_STRING), ("raw", CT_BINARY)]
        vals = {"b": b, "i": i, "l": l_, "d": d, "s": s, "raw": raw}
        out = _decode_props(_encode_props(vals, cols), cols)
        assert out == vals


class TestTextFormatProperties:
    @settings(max_examples=150, deadline=None)
    @given(geometries())
    def test_kml_roundtrip(self, wkb):
        from gdal_spark.formats.kml import _geometry_kml, parse_kml

        doc = (
            '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
            f"<Placemark>{_geometry_kml(wkb)}</Placemark></Document></kml>"
        )
        rec = parse_kml(doc.encode())[0]
        _assert_same(wkb, rec["geometry"])

    @settings(max_examples=150, deadline=None)
    @given(geometries())
    def test_geojson_roundtrip(self, wkb):
        g = geom.parse_wkb(bytes(wkb))
        gj = geom.geometry_to_geojson(g)
        back = geom.geometry_to_wkb(geom.parse_geojson(gj))
        _assert_same(wkb, back)

    @settings(max_examples=150, deadline=None)
    @given(geometries())
    def test_wkt_roundtrip(self, wkb):
        g = geom.parse_wkb(bytes(wkb))
        back = geom.geometry_to_wkb(geom.parse_wkt(geom.geometry_to_wkt(g)))
        _assert_same(wkb, back)
