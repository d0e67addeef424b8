"""Baseline JFIF/JPEG codec tests — real libjpeg bytes + round-trips.

The decode side is validated against bytes produced by the *actual* libjpeg
encoder (GDAL autotest fixtures, see tests/data/README.md), with the
uncompressed TIFF source as pixel ground truth where available. The encode
side is validated by marker-structure checks and decoder round-trips.
Reference behavior: frmts/jpeg/jpgdataset.cpp (libjpeg wrapper).
"""

import os
import struct
import zlib

import numpy as np
import pytest

from gdal_spark import codecs, jpeg
from gdal_spark.codecs import psnr

DATA = os.path.join(os.path.dirname(__file__), "data")


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _decode_deflate_tiff(buf):
    """Minimal reader for the rgbsmall.tif ground truth: little-endian,
    Deflate (32946), planar config 2, one strip per band."""
    assert buf[:4] == b"II*\x00"
    (off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, off)
    tags = {}
    for k in range(n):
        tag, typ, cnt, val = struct.unpack_from("<HHII", buf, off + 2 + 12 * k)
        tags[tag] = (typ, cnt, val)

    def vals(tag, fmt, size):
        typ, cnt, val = tags[tag]
        if cnt * size <= 4:
            return [val]
        return list(struct.unpack_from("<" + str(cnt) + fmt, buf, val))

    w, h = tags[256][2], tags[257][2]
    assert tags[259][2] == 32946  # Deflate
    offsets = vals(273, "I", 4)
    counts = vals(279, "I", 4)
    planes = [
        np.frombuffer(zlib.decompress(buf[o : o + c]), np.uint8).reshape(h, w)
        for o, c in zip(offsets, counts)
    ]
    return np.stack(planes, axis=-1)


class TestRealJpegDecode:
    def test_rgbsmall_vs_tiff_ground_truth(self):
        """Decode real libjpeg bytes; PSNR vs the uncompressed source must
        reflect only JPEG quantization loss (~q75), not decoder error."""
        img = jpeg.decode_jpeg(_read("rgbsmall_rgb.jpg"))
        ref = _decode_deflate_tiff(_read("rgbsmall.tif"))
        assert img.shape == (50, 50, 3) and img.dtype == np.uint8
        p = psnr(ref, img)
        assert p >= 30.0, f"PSNR {p:.2f} too low — decoder is broken"
        # channel means must track the source closely (catches swapped
        # channels / wrong color transform)
        assert np.abs(ref.mean(axis=(0, 1)) - img.mean(axis=(0, 1))).max() < 1.0

    def test_albania_ycbcr_420(self):
        """361x260 baseline JFIF with 4:2:0 subsampling and two quant +
        four Huffman tables — the common real-world shape."""
        img = jpeg.decode_jpeg(_read("albania.jpg"))
        assert img.shape == (260, 361, 3) and img.dtype == np.uint8
        # deterministic decode (regression golden on our own output)
        again = jpeg.decode_jpeg(_read("albania.jpg"))
        assert np.array_equal(img, again)
        # plausible photographic content, not Huffman desync noise:
        # desync yields near-uniform noise with per-channel std ~74
        assert 20 < img.mean() < 235
        gx = np.abs(np.diff(img[:, :, 0].astype(int), axis=1)).mean()
        assert gx < 20, "horizontal gradient too noisy — likely desync"

    def test_black_exact(self):
        """All-black 1024x1024 main scan must decode to exactly zero
        (EXIF APP1 + appended overview must be skipped correctly)."""
        img = jpeg.decode_jpeg(_read("black_with_white_exif_ovr.jpg"))
        assert img.shape[:2] == (1024, 1024)
        assert int(np.asarray(img).max()) == 0

    def test_real_progressive_fixture(self):
        """SOF2 file from the wild (ArcGIS-written): constant-1 30x30
        grayscale — an exact golden for the progressive scan plumbing."""
        img = jpeg.decode_jpeg(_read("arcgis_geodataxform_gcp.jpg"))
        assert img.shape == (30, 30)
        assert np.array_equal(np.unique(img), [1])

    def test_lossless_rejected(self):
        # SOF3 (lossless) must raise, not mis-decode
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(_read("byte_lossless.jpg"))


class TestProgressive:
    """Successive approximation is lossless over quantized coefficients,
    so progressive and baseline encodings of the same image MUST decode
    bit-identically — this pins the refinement decode path (T.81 G.1.2.3)
    exactly."""

    def _img(self, h, w, noisy=False):
        rng = np.random.default_rng(7)
        if noisy:
            return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
                128 + 60 * np.cos(xx / 13.0),
                (xx * 2.5 + yy * 1.5) % 256,
            ],
            axis=-1,
        )
        return np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.uint8)

    @pytest.mark.parametrize("sub,q", [("4:4:4", 35), ("4:4:4", 95), ("4:2:0", 75)])
    def test_bit_identical_to_baseline(self, sub, q):
        img = self._img(61, 83)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q, subsampling=sub))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=q, subsampling=sub, progressive=True)
        )
        assert np.array_equal(base, prog)

    def test_noise_stresses_refinement_bits(self):
        img = self._img(37, 53, noisy=True)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=30, subsampling="4:4:4"))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=30, subsampling="4:4:4", progressive=True)
        )
        assert np.array_equal(base, prog)

    def test_gray_progressive(self):
        img = self._img(40, 56)[:, :, 0]
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=80))
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=80, progressive=True))
        assert np.array_equal(base, prog)

    def test_sof2_marker_written(self):
        buf = jpeg.encode_jpeg(self._img(16, 16), progressive=True)
        assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf.split(b"\xff\xda")[0]


class TestEncoderRoundTrip:
    @staticmethod
    def _smooth(h, w, c=3):
        yy, xx = np.mgrid[0:h, 0:w]
        chans = [
            128 + 70 * np.sin(xx / 11.0) * np.cos(yy / 9.0),
            128 + 50 * np.cos((xx + yy) / 17.0),
            60 + (xx * 1.2 + yy * 0.7) % 120,
        ]
        img = np.stack(chans[:c], axis=-1)
        return np.clip(img, 0, 255).astype(np.uint8)

    def test_444_high_quality_psnr(self):
        img = self._smooth(61, 83)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95, subsampling="4:4:4"))
        assert out.shape == img.shape
        assert psnr(img, out) >= 40.0

    def test_420_odd_dims(self):
        img = self._smooth(37, 51)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=92, subsampling="4:2:0"))
        assert out.shape == img.shape
        assert psnr(img, out) >= 30.0

    def test_gray(self):
        img = self._smooth(40, 56)[:, :, 0]
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert psnr(img, out) >= 40.0

    def test_marker_structure(self):
        """Output must be a structurally valid JFIF stream."""
        buf = jpeg.encode_jpeg(self._smooth(16, 16), quality=90)
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        markers = []
        i = 2
        while i < len(buf) - 1:
            assert buf[i] == 0xFF
            m = buf[i + 1]
            markers.append(m)
            if m == 0xDA:
                break
            ln = (buf[i + 2] << 8) | buf[i + 3]
            i += 2 + ln
        assert markers[0] == 0xE0  # JFIF APP0 first
        assert markers.count(0xDB) == 2 and markers.count(0xC4) == 4
        assert 0xC0 in markers and markers[-1] == 0xDA

    def test_no_unstuffed_ff_in_scan(self):
        buf = jpeg.encode_jpeg(self._smooth(24, 24), quality=5)  # coarse: many 1-bits
        # between SOS payload and EOI, every 0xFF must be followed by 0x00
        sos = buf.find(b"\xff\xda")
        ln = (buf[sos + 2] << 8) | buf[sos + 3]
        scan = buf[sos + 2 + ln : -2]
        k = 0
        while True:
            k = scan.find(b"\xff", k)
            if k == -1 or k == len(scan) - 1:
                break
            assert scan[k + 1] == 0x00
            k += 2


class TestDispatch:
    def test_decode_image_sniffs_jfif_vs_gsj1(self):
        img = TestEncoderRoundTrip._smooth(32, 32)
        real = jpeg.encode_jpeg(img, quality=95, subsampling="4:4:4")
        own = codecs.encode_gsj(img, quality=95)
        a = codecs.decode_image(real, "jpg")
        b = codecs.decode_image(own, "jpg")
        assert a.shape == b.shape == img.shape
        assert psnr(img, a) >= 40 and psnr(img, b) >= 40

    def test_encode_image_jpeg_fmt(self):
        img = TestEncoderRoundTrip._smooth(32, 32)
        buf = codecs.encode_image(img, "jpeg")
        assert buf[:2] == b"\xff\xd8"
        assert codecs.decode_image(buf, "jpeg").shape == img.shape

    def test_probe_metadata_real_jpeg(self):
        from gdal_spark.functions.multimodal import probe_metadata

        meta = probe_metadata(_read("albania.jpg"), "jpg")
        assert meta["ok"] and (meta["width"], meta["height"]) == (361, 260)
        assert meta["channels"] == 3


class TestSparkPlumbing:
    def test_real_jpeg_through_metadata_and_resize(self, spark):
        """Real JPEG bytes flow through the same mapInPandas plumbing as
        the engine's own codecs — metadata probe + resize to PNG."""
        from gdal_spark.functions.multimodal import image_resize, with_metadata

        rows = [
            ("alb", _read("albania.jpg"), "jpg"),
            ("rgb", _read("rgbsmall_rgb.jpg"), "jpg"),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        meta = {r["image_id"]: r for r in with_metadata(df).collect()}
        assert meta["alb"]["width"] == 361 and meta["rgb"]["width"] == 50
        out = image_resize(df, 16, 16, out_fmt="png").collect()
        for r in out:
            arr = codecs.decode_png(bytes(r["bytes"]))
            assert arr.shape == (16, 16, 3)


class TestNonInterleavedSingleComponent:
    """T.81 A.2.2: a single-component scan is non-interleaved — the
    sampling factors declared in SOF do not group blocks into MCUs."""

    def test_gray_with_2x2_sampling_factors(self):
        import numpy as np

        from gdal_spark.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        buf = bytearray(encode_jpeg(img, quality=90))
        # find SOF0 (FFC0) and patch the single component's sampling
        # byte from 0x11 to 0x22 — entropy data is unchanged and per
        # spec the decode result must be identical
        i = buf.find(b"\xff\xc0")
        assert i > 0
        # SOF: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) then per
        # component: id(1) sampling(1) qtab(1)
        scomp = i + 2 + 2 + 1 + 2 + 2 + 1
        assert buf[scomp + 1] == 0x11
        ref = decode_jpeg(bytes(buf))
        buf[scomp + 1] = 0x22
        got = decode_jpeg(bytes(buf))
        np.testing.assert_array_equal(got, ref)


class TestTruncation:
    def test_truncated_scan_raises(self):
        import numpy as np
        import pytest as _pytest

        from gdal_spark.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        buf = encode_jpeg(img, quality=90)
        # cut 30% of the entropy data (keep headers: SOS comes early)
        sos = buf.find(b"\xff\xda")
        cut = sos + (len(buf) - sos) * 7 // 10
        with _pytest.raises(ValueError, match="truncated|corrupt"):
            decode_jpeg(buf[:cut] + b"\xff\xd9")
