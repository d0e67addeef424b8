"""Grid math vs hand-computed constants from gdal2tiles.py:315-530."""

import math

import numpy as np
import pytest

from gdal_spark.grid import (
    ORIGIN_SHIFT,
    GeodeticGrid,
    MercatorGrid,
    geo_query,
    xyz_flip,
)

M = MercatorGrid()


def test_constants():
    assert ORIGIN_SHIFT == pytest.approx(20037508.342789244, abs=1e-6)
    assert M.initial_resolution == pytest.approx(156543.03392804062, abs=1e-8)


def test_latlon_meters_roundtrip():
    lat = np.array([0.0, 45.0, -60.0, 85.05112878, -85.0])
    lon = np.array([0.0, 10.0, -120.0, 179.9, -179.9])
    mx, my = M.latlon_to_meters(lat, lon)
    lat2, lon2 = M.meters_to_latlon(mx, my)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    # equator/prime meridian maps to origin
    assert M.latlon_to_meters(0.0, 0.0)[0] == 0.0
    # 180E maps to originShift
    assert M.latlon_to_meters(0.0, 180.0)[0] == pytest.approx(ORIGIN_SHIFT)
    # top of the mercator square
    assert M.latlon_to_meters(85.05112878, 0)[1] == pytest.approx(ORIGIN_SHIFT, rel=1e-9)


def test_meters_to_tile_z0_z1():
    # whole world is one tile at z0
    tx, ty = M.meters_to_tile(-20037508.0, -20037508.0, 0)
    assert (tx, ty) == (0, 0)
    tx, ty = M.meters_to_tile(20037508.0, 20037508.0, 0)
    assert (tx, ty) == (0, 0)
    # z1 quadrants (TMS: y up)
    assert tuple(M.meters_to_tile(-1.0, -1.0, 1)) == (0, 0)
    assert tuple(M.meters_to_tile(1.0, 1.0, 1)) == (1, 1)


def test_pixels_to_tile_ceil_semantics():
    # int(ceil(px/256) - 1): px=0 -> tile -1 (left edge belongs to previous
    # tile in gdal2tiles' convention), px=1..256 -> 0, px=257 -> 1
    tx, _ = M.pixels_to_tile(np.array([0.0, 1.0, 256.0, 256.5, 257.0]), np.zeros(5))
    assert tx.tolist() == [-1, 0, 0, 1, 1]


def test_tile_bounds_roundtrip():
    minx, miny, maxx, maxy = M.tile_bounds(0, 0, 0)
    assert minx == pytest.approx(-ORIGIN_SHIFT)
    assert maxy == pytest.approx(ORIGIN_SHIFT)
    # center of a tile maps back to that tile at every zoom
    for z in (1, 4, 9, 15):
        tx, ty = 3 % (2**z), (2**z) - 1
        b = M.tile_bounds(tx, ty, z)
        cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
        assert tuple(int(v) for v in M.meters_to_tile(cx, cy, z)) == (tx, ty)


def test_zoom_for_pixel_size():
    # exactly at resolution(i) stays at i; above goes to i-1
    for z in (0, 3, 10):
        res = M.initial_resolution / 2**z
        assert int(M.zoom_for_pixel_size(res)) == z
        assert int(M.zoom_for_pixel_size(res * 1.0001)) == max(0, z - 1)
    assert int(M.zoom_for_pixel_size(1e9)) == 0
    arr = M.zoom_for_pixel_size(np.array([1e9, M.initial_resolution / 8]))
    assert arr.tolist() == [0, 3]


def test_tile_range_world_image():
    # small_world-like global extent
    minx, miny = M.latlon_to_meters(-85.05112878, -180.0)
    maxx, maxy = M.latlon_to_meters(85.05112878, 180.0)
    for z in (0, 1, 2):
        tminx, tminy, tmaxx, tmaxy = M.tile_range(minx, miny, maxx, maxy, z)
        assert (tminx, tminy) == (0, 0)
        assert (tmaxx, tmaxy) == (2**z - 1, 2**z - 1)


def test_xyz_flip_involution():
    ty = np.arange(8)
    assert np.array_equal(xyz_flip(xyz_flip(ty, 3), 3), ty)
    assert int(xyz_flip(0, 0)) == 0


def test_geodetic_grid():
    G = GeodeticGrid(tmscompatible=True)
    # two tiles horizontally at z0
    tx, ty = G.lonlat_to_tile(-90.0, 0.0, 0)
    assert (int(tx), int(ty)) == (0, 0)
    tx, ty = G.lonlat_to_tile(90.0, 0.0, 0)
    assert (int(tx), int(ty)) == (1, 0)


def test_geo_query_inside():
    # world image: 400x200, gt=(-180, 0.9, 0, 90, 0, -0.9)
    gt = (-180.0, 0.9, 0.0, 90.0, 0.0, -0.9)
    r, wnd = geo_query(gt, 400, 200, -180.0, 90.0, 0.0, 0.0, querysize=1024)
    rx, ry, rxs, rys = (int(v) for v in r)
    wx, wy, wxs, wys = (int(v) for v in wnd)
    assert (rx, ry, rxs, rys) == (0, 0, 200, 100)
    assert (wx, wy, wxs, wys) == (0, 0, 1024, 1024)


def test_geo_query_clamps():
    gt = (-180.0, 0.9, 0.0, 90.0, 0.0, -0.9)
    # query box hanging off the left/top edge of the raster
    r, wnd = geo_query(gt, 400, 200, -200.0, 100.0, -160.0, 60.0, querysize=256)
    rx, ry, rxs, rys = (int(v) for v in r)
    wx, wy, wxs, wys = (int(v) for v in wnd)
    assert rx == 0 and ry == 0
    assert rxs <= 400 and rys <= 200
    assert wx > 0 and wy > 0
    # and off the right/bottom edge
    r, wnd = geo_query(gt, 400, 200, 100.0, 0.0, 200.0, -100.0, querysize=256)
    rx, ry, rxs, rys = (int(v) for v in r)
    wx, wy, wxs, wys = (int(v) for v in wnd)
    assert rx + rxs <= 400 and ry + rys <= 200
    assert wxs < 256 and wys < 256


def test_geo_query_matches_scalar_reference():
    """Vectorized geo_query == straight transcription of the scalar
    formulas from gdal2tiles.py:2964-3006."""

    def scalar(gt, rw, rh, ulx, uly, lrx, lry, querysize=0):
        rx = int((ulx - gt[0]) / gt[1] + 0.001)
        ry = int((uly - gt[3]) / gt[5] + 0.001)
        rxsize = max(1, int((lrx - ulx) / gt[1] + 0.5))
        rysize = max(1, int((lry - uly) / gt[5] + 0.5))
        wxsize, wysize = (querysize, querysize) if querysize else (rxsize, rysize)
        wx = 0
        if rx < 0:
            rxshift = abs(rx)
            wx = int(wxsize * (float(rxshift) / rxsize))
            wxsize = wxsize - wx
            rxsize = rxsize - int(rxsize * (float(rxshift) / rxsize))
            rx = 0
        if rx + rxsize > rw:
            wxsize = int(wxsize * (float(rw - rx) / rxsize))
            rxsize = rw - rx
        wy = 0
        if ry < 0:
            ryshift = abs(ry)
            wy = int(wysize * (float(ryshift) / rysize))
            wysize = wysize - wy
            rysize = rysize - int(rysize * (float(ryshift) / rysize))
            ry = 0
        if ry + rysize > rh:
            wysize = int(wysize * (float(rh - ry) / rysize))
            rysize = rh - ry
        return (rx, ry, rxsize, rysize), (wx, wy, wxsize, wysize)

    rng = np.random.default_rng(7)
    gt = (-180.0, 0.9, 0.0, 90.0, 0.0, -0.9)
    for _ in range(200):
        ulx = float(rng.uniform(-400, 400))
        lrx = ulx + float(rng.uniform(1, 300))
        uly = float(rng.uniform(-200, 200))
        lry = uly - float(rng.uniform(1, 150))
        qs = int(rng.choice([0, 256, 1024]))
        want = scalar(gt, 400, 200, ulx, uly, lrx, lry, qs)
        got_r, got_w = geo_query(gt, 400, 200, ulx, uly, lrx, lry, qs)
        got = (tuple(int(v) for v in got_r), tuple(int(v) for v in got_w))
        assert got == want, (ulx, uly, lrx, lry, qs)
