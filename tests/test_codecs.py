"""Real-codec tests: WAV/BMP/PPM encode-decode round-trips, resize,
and feature extraction — all pure NumPy, no Spark needed here (the
Spark plumbing is covered in tests/test_llm_ops.py multimodal
tests)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from afg_data_pipeline_spark.operators.codecs import (
    audio_features,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    image_features,
    resize_area,
    resize_nearest,
    synth_bmp_for_text,
    synth_wav_for_text,
)


class TestWav:
    def test_roundtrip_pcm16_mono(self):
        sr = 8000
        t = np.arange(800) / sr
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        d = decode_wav(encode_wav(x, sr))
        assert d["sample_rate"] == sr
        assert d["n_channels"] == 1
        assert d["n_frames"] == 800
        # PCM16 quantization error bound: 1/32767 per sample
        assert np.max(np.abs(d["samples"][:, 0] - x)) < 1.5 / 32767

    def test_roundtrip_stereo(self):
        x = np.stack(
            [np.linspace(-0.9, 0.9, 100), np.linspace(0.9, -0.9, 100)],
            axis=1,
        )
        d = decode_wav(encode_wav(x, 44100))
        assert d["n_channels"] == 2
        assert d["n_frames"] == 100
        assert np.max(np.abs(d["samples"] - x)) < 1.5 / 32767

    def test_float32_and_u8_paths(self):
        # hand-build a float32 WAV
        x = np.linspace(-1, 1, 64).astype("<f4")
        raw = x.tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
        body = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(raw))
            + raw
        )
        d = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
        assert np.allclose(d["samples"][:, 0], x.astype(np.float64))
        # and an 8-bit PCM one (unsigned, midpoint 128)
        u8 = np.array([0, 128, 255], dtype=np.uint8)
        fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body8 = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt8))
            + fmt8
            + b"data"
            + struct.pack("<I", 3)
            + u8.tobytes()
            + b"\x00"  # odd-size chunk pad
        )
        d8 = decode_wav(b"RIFF" + struct.pack("<I", len(body8)) + body8)
        assert np.allclose(d8["samples"][:, 0], [-1.0, 0.0, 127 / 128])

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_wav(b"not a wav at all")

    def test_rejects_truncated_data_chunk(self):
        x = np.linspace(-0.5, 0.5, 64)
        wav = encode_wav(x, 8000)
        with pytest.raises(ValueError, match="truncated WAVE data"):
            decode_wav(wav[:-10])

    def test_rejects_misaligned_data_length(self):
        # A data chunk whose byte length is not a multiple of the
        # sample width must be a codec-level error, not an opaque
        # numpy frombuffer failure.
        x = np.linspace(-0.5, 0.5, 64)
        wav = bytearray(encode_wav(x, 8000))
        pos = wav.find(b"data")
        (csize,) = struct.unpack_from("<I", wav, pos + 4)
        struct.pack_into("<I", wav, pos + 4, csize - 1)
        struct.pack_into("<I", wav, 4, len(wav) - 8 - 1)
        with pytest.raises(ValueError, match="sample width"):
            decode_wav(bytes(wav[:-1]))

    def test_features_shape_and_duration(self):
        sr = 8000
        x = 0.25 * np.sin(2 * np.pi * 100 * np.arange(sr) / sr)
        f = audio_features(decode_wav(encode_wav(x, sr)))
        assert len(f) == 8
        assert f[0] == pytest.approx(1.0)  # duration
        assert f[1] == pytest.approx(0.25 / np.sqrt(2), rel=1e-3)  # rms
        assert f[2] == pytest.approx(0.25, rel=1e-3)  # peak
        # a 100 Hz tone's energy lives in the lowest band
        assert f[4] > f[5] and f[4] > f[6] and f[4] > f[7]


class TestBmp:
    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_top_down_and_32bpp(self):
        # hand-build a 2x2 top-down 32bpp BMP: rows not padded,
        # height negative, BGRA order
        px = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 8, 7]]],
            dtype=np.uint8,
        )
        bgra = np.dstack([px[:, :, ::-1], np.full((2, 2, 1), 255, np.uint8)])
        raw = bgra.reshape(2, -1).tobytes()
        dib = struct.pack(
            "<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(raw), 0, 0, 0, 0
        )
        off = 14 + len(dib)
        data = (
            b"BM"
            + struct.pack("<IHHI", off + len(raw), 0, 0, off)
            + dib
            + raw
        )
        assert np.array_equal(decode_bmp(data), px)

    def test_rejects_compressed(self):
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        data = bytearray(encode_bmp(img))
        struct.pack_into("<I", data, 30, 1)  # BI_RLE8
        with pytest.raises(ValueError):
            decode_bmp(bytes(data))


class TestPpm:
    def test_roundtrip_and_comment_header(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        with_comment = (
            b"P6\n# a comment line\n7 5\n255\n" + img.tobytes()
        )
        assert np.array_equal(decode_ppm(with_comment), img)


class TestResize:
    def test_nearest_identity_and_shrink(self):
        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        assert np.array_equal(resize_nearest(img, 6, 4), img)
        small = resize_nearest(img, 3, 2)
        assert small.shape == (2, 3, 3)
        assert np.array_equal(small[0, 0], img[0, 0])

    def test_area_mean_pooling(self):
        img = np.zeros((4, 4, 1), dtype=np.uint8)
        img[:2, :2] = 100  # top-left quadrant
        out = resize_area(img, 2, 2)
        assert out[0, 0, 0] == 100 and out[1, 1, 0] == 0

    def test_image_features(self):
        img = np.full((10, 20, 3), 255, dtype=np.uint8)
        f = image_features(img)
        assert f[:3] == [20.0, 10.0, 2.0]
        assert f[3:6] == [255.0, 255.0, 255.0]
        assert f[7] == 0.0  # zero contrast
        assert f[-1] == pytest.approx(1.0)  # all luma in top bin


class TestSynth:
    def test_deterministic_and_decodable(self):
        a1, a2 = synth_wav_for_text("hola"), synth_wav_for_text("hola")
        assert a1 == a2
        assert a1 != synth_wav_for_text("adios")
        d = decode_wav(a1)
        assert d["n_frames"] > 0 and d["sample_rate"] == 8000
        b1 = synth_bmp_for_text("hola")
        assert b1 == synth_bmp_for_text("hola")
        img = decode_bmp(b1)
        assert img.ndim == 3 and img.shape[2] == 3


class TestPngCodec:
    def _pixels(self, h=11, w=7):
        import hashlib

        import numpy as np

        px = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                d = hashlib.md5(f"{y},{x}".encode()).digest()
                px[y, x] = d[0], d[1], d[2]
        return px

    def test_all_five_filters_round_trip(self):
        from afg_data_pipeline_spark.operators.codecs import (
            decode_png,
            encode_png,
        )

        px = self._pixels()
        for ft in range(5):
            back = decode_png(encode_png(px, filter_type=ft))
            assert (back == px).all(), f"filter {ft}"

    def test_gray_rgba_palette_color_types(self):
        import struct
        import zlib

        import numpy as np

        from afg_data_pipeline_spark.operators.codecs import (
            _PNG_SIG,
            _png_chunk,
            decode_png,
        )

        def build(ctype, raw_rows, extra=b""):
            h = len(raw_rows)
            w = len(raw_rows[0]) // {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[
                ctype
            ]
            ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
            body = b"".join(b"\x00" + r for r in raw_rows)
            return (
                _PNG_SIG
                + _png_chunk(b"IHDR", ihdr)
                + extra
                + _png_chunk(b"IDAT", zlib.compress(body))
                + _png_chunk(b"IEND", b"")
            )

        # grayscale 2x2 -> replicated channels
        g = decode_png(build(0, [bytes([10, 20]), bytes([30, 40])]))
        assert (g[:, :, 0] == [[10, 20], [30, 40]]).all()
        assert (g[:, :, 0] == g[:, :, 1]).all()
        # RGBA 1x2 -> alpha dropped
        r = decode_png(
            build(6, [bytes([1, 2, 3, 255, 4, 5, 6, 0])])
        )
        assert r.tolist() == [[[1, 2, 3], [4, 5, 6]]]
        # palette 1x2
        plte = _png_chunk(
            b"PLTE", bytes([255, 0, 0, 0, 255, 0])
        )
        p = decode_png(
            build(3, [bytes([0, 1])], extra=plte)
        )
        assert p.tolist() == [[[255, 0, 0], [0, 255, 0]]]

    def test_interlaced_and_16bit_raise(self):
        import struct
        import zlib

        from afg_data_pipeline_spark.operators.codecs import (
            _PNG_SIG,
            _png_chunk,
            decode_png,
        )

        import pytest

        for depth, interlace in ((16, 0), (8, 1)):
            ihdr = struct.pack(
                ">IIBBBBB", 1, 1, depth, 2, 0, 0, interlace
            )
            data = (
                _PNG_SIG
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(
                    b"IDAT", zlib.compress(b"\x00\x00\x00\x00")
                )
                + _png_chunk(b"IEND", b"")
            )
            with pytest.raises(NotImplementedError):
                decode_png(data)


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


def _jpeg_quantization_replica(px, quality, subsample):
    """Independent reference for what baseline JPEG round-trip must
    produce: the QUANTIZATION-DOMAIN ground truth computed directly
    in the pixel domain — RGB->YCbCr, (optional) 2x2-mean chroma
    downsample, per-block DCT -> quantize -> dequantize -> IDCT,
    upsample, YCbCr->RGB — with NO huffman coding, NO bitstream, NO
    marker segments anywhere. decode_jpeg(encode_jpeg(px)) must
    equal this array BIT-EXACTLY, which proves the entire entropy
    layer (canonical huffman tables, DPCM, run-length, byte
    stuffing, restart markers, marker parse) is lossless."""
    from afg_data_pipeline_spark.operators.codecs import (
        _JPEG_DCT as C,
        _JPEG_QT_CHROM,
        _JPEG_QT_LUM,
        _JPEG_ZIGZAG as ZZ,
        _jpeg_quality_scale,
    )

    px = np.asarray(px, dtype=np.float64)
    h, w, _ = px.shape
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qlum = _jpeg_quality_scale(_JPEG_QT_LUM, quality)
    qch = _jpeg_quality_scale(_JPEG_QT_CHROM, quality)

    def pad_to(p, m):
        return np.pad(
            p,
            ((0, (-p.shape[0]) % m), (0, (-p.shape[1]) % m)),
            mode="edge",
        )

    def rt_plane(plane, qt):
        H, W = plane.shape
        out = np.zeros((H, W))
        for y0 in range(0, H, 8):
            for x0 in range(0, W, 8):
                blk = plane[y0 : y0 + 8, x0 : x0 + 8]
                coefs = C @ (blk - 128.0) @ C.T
                qz = np.round(coefs.flatten()[ZZ] / qt[ZZ]).astype(
                    np.int64
                )
                nat = np.zeros(64)
                nat[ZZ] = qz * qt[ZZ]
                rec = C.T @ nat.reshape(8, 8) @ C
                out[y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                    np.round(rec + 128.0), 0, 255
                )
        return out

    if subsample:
        yr = rt_plane(pad_to(y, 16), qlum)[:h, :w]
        cbd = pad_to(
            pad_to(cb, 2)
            .reshape(-1, 2, (pad_to(cb, 2).shape[1]) // 2, 2)
            .mean(axis=(1, 3)),
            8,
        )
        crd = pad_to(
            pad_to(cr, 2)
            .reshape(-1, 2, (pad_to(cr, 2).shape[1]) // 2, 2)
            .mean(axis=(1, 3)),
            8,
        )
        cbu = np.repeat(
            np.repeat(rt_plane(cbd, qch), 2, 0), 2, 1
        )[:h, :w]
        cru = np.repeat(
            np.repeat(rt_plane(crd, qch), 2, 0), 2, 1
        )[:h, :w]
    else:
        yr = rt_plane(pad_to(y, 8), qlum)[:h, :w]
        cbu = rt_plane(pad_to(cb, 8), qch)[:h, :w]
        cru = rt_plane(pad_to(cr, 8), qch)[:h, :w]
    rr = yr + 1.402 * (cru - 128.0)
    gg = (
        yr
        - 0.344136 * (cbu - 128.0)
        - 0.714136 * (cru - 128.0)
    )
    bb = yr + 1.772 * (cbu - 128.0)
    return np.clip(
        np.round(np.stack([rr, gg, bb], axis=2)), 0, 255
    ).astype(np.uint8)


class TestJpegCodec:
    def _images(self):
        rng = np.random.RandomState(42)
        xx, yy = np.meshgrid(np.arange(31), np.arange(24))
        grad = np.stack(
            [
                (xx * 255) // 30,
                (yy * 255) // 23,
                ((xx + yy) * 4) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        noise = rng.randint(0, 256, (17, 9, 3), dtype=np.uint8)
        return {"gradient_31x24": grad, "noise_17x9": noise}

    @pytest.mark.parametrize("quality", [50, 75, 95])
    @pytest.mark.parametrize("subsample", [True, False])
    def test_entropy_layer_lossless_vs_replica(
        self, quality, subsample
    ):
        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        for name, px in self._images().items():
            got = decode_jpeg(
                encode_jpeg(px, quality=quality, subsample=subsample)
            )
            want = _jpeg_quantization_replica(px, quality, subsample)
            assert got.dtype == np.uint8 and got.shape == px.shape
            assert np.array_equal(got, want), (
                name,
                quality,
                subsample,
            )

    def test_restart_markers_bit_identical(self):
        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        px = self._images()["gradient_31x24"]
        base = decode_jpeg(encode_jpeg(px, restart_interval=0))
        for ri in (1, 2, 5):
            with_rst = decode_jpeg(
                encode_jpeg(px, restart_interval=ri)
            )
            assert np.array_equal(base, with_rst), ri

    def test_constant_gray_is_exact(self):
        # All-128: every level-shifted block is zero -> zero coefs
        # -> exact reconstruction regardless of quality/layout.
        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        px = np.full((20, 13, 3), 128, dtype=np.uint8)
        for ss in (True, False):
            out = decode_jpeg(
                encode_jpeg(px, quality=50, subsample=ss)
            )
            assert np.array_equal(out, px)

    def test_lossy_but_close_on_smooth_content(self):
        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        px = self._images()["gradient_31x24"]
        out = decode_jpeg(encode_jpeg(px, quality=95, subsample=False))
        mae = float(np.mean(np.abs(out.astype(int) - px.astype(int))))
        assert mae < 3.0, mae

    def test_golden_fixture_bit_exact(self):
        """Frozen artifact check: a committed baseline JPEG decodes
        bit-exactly to its committed golden pixel array (the golden
        was generated by the quantization replica above, NOT by
        decode_jpeg — see tests/fixtures/make_jpeg_golden.py)."""
        import os

        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
        )

        path = os.path.join(
            os.path.dirname(__file__), "fixtures", "jpeg_golden.npz"
        )
        blob = np.load(path)
        got = decode_jpeg(blob["jpeg"].tobytes())
        assert np.array_equal(got, blob["pixels"])

    def test_rejects_and_raises(self):
        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"\x00\x01garbage")
        # Progressive: flip SOF0 (0xC0) to SOF2 (0xC2).
        px = np.full((8, 8, 3), 99, dtype=np.uint8)
        data = bytearray(encode_jpeg(px, subsample=False))
        idx = bytes(data).find(b"\xff\xc0")
        data[idx + 1] = 0xC2
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(bytes(data))
        with pytest.raises(ValueError, match="quality"):
            encode_jpeg(px, quality=0)
        with pytest.raises(ValueError, match="expects"):
            encode_jpeg(np.zeros((4, 4), dtype=np.uint8))

    def test_synth_jpeg_deterministic_and_decodable(self):
        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
            synth_jpeg_for_text,
        )

        a = synth_jpeg_for_text("hello world")
        b = synth_jpeg_for_text("hello world")
        c = synth_jpeg_for_text("other doc")
        assert a == b and a != c
        img = decode_jpeg(a)
        assert img.ndim == 3 and img.shape[2] == 3


class TestJpegRobustness:
    """decode_jpeg against legal-but-unusual and truncated streams
    (decode_raster dispatches ANY crawl bytes starting FFD8 here,
    so foreign streams must fail diagnosably, never with a bare
    IndexError)."""

    def _jpeg(self):
        import numpy as np

        from afg_data_pipeline_spark.operators.codecs import (
            encode_jpeg,
        )

        rng = np.random.RandomState(3)
        px = rng.randint(0, 256, (12, 10, 3), dtype=np.uint8)
        return px, encode_jpeg(px, quality=75)

    def test_fill_bytes_before_markers_accepted(self):
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede
        # a marker. Inject fills before every marker segment in the
        # header (up to SOS) — decode must be bit-identical.
        import numpy as np

        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
        )

        px, data = self._jpeg()
        base = decode_jpeg(data)
        # walk the marker stream and rebuild with fills
        out = bytearray(data[:2])
        pos = 2
        while pos < len(data):
            assert data[pos] == 0xFF
            marker = data[pos + 1]
            out += b"\xff\xff\xff"  # three fill bytes
            if marker == 0xDA:  # SOS: copy the rest verbatim
                out += data[pos:]
                break
            seglen = int.from_bytes(
                data[pos + 2 : pos + 4], "big"
            )
            out += data[pos : pos + 2 + seglen]
            pos += 2 + seglen
        got = decode_jpeg(bytes(out))
        assert np.array_equal(got, base)

    def test_truncated_streams_raise_value_error(self):
        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
        )

        _px, data = self._jpeg()
        # header cuts, scan cuts, and a lone trailing 0xFF: every
        # prefix must raise ValueError/NotImplementedError — never
        # IndexError/struct.error.
        cuts = sorted(
            {3, 5, 10, len(data) // 2, len(data) - 3}
        )
        for cut in cuts:
            with pytest.raises((ValueError, NotImplementedError)):
                decode_jpeg(data[:cut])
        # NB: garbage AFTER the last complete MCU is legally
        # ignored (the reader never consumes past the scan), so a
        # trailing lone 0xFF does not — and should not — raise.
