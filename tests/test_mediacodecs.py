"""Pure-python media codecs: byte-exact roundtrips, golden pixel checks,
format sniffing, and the real feature math."""

import numpy as np
import pytest

from informationretrieval_en_people_cn_ray.stages import mediacodecs as mc


def test_bmp_roundtrip_and_stride_padding():
    # width 3 → row stride pads to 12 bytes; values survive exactly
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = mc.encode_bmp(img)
    assert mc.sniff(payload) == "bmp"
    assert np.array_equal(mc.decode_bmp(payload), img)
    # odd widths across the 4-byte boundary
    for w in (1, 2, 5, 7):
        im = np.random.RandomState(w).randint(
            0, 256, (3, w, 3)
        ).astype(np.uint8)
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(im)), im)


def test_ppm_roundtrip_and_comment_header():
    img = np.random.RandomState(1).randint(0, 256, (4, 5, 3)).astype(np.uint8)
    payload = mc.encode_ppm(img)
    assert mc.sniff(payload) == "ppm"
    assert np.array_equal(mc.decode_ppm(payload), img)
    # header comments are legal PPM
    commented = b"P6\n# a comment\n5 4\n255\n" + img.tobytes()
    assert np.array_equal(mc.decode_ppm(commented), img)


def test_wav_roundtrip_and_spectra():
    rate = 8000
    t = np.arange(4000)
    tone = (3000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    payload = mc.encode_wav(tone, rate, 1)
    assert mc.sniff(payload) == "wav"
    samples, r, c = mc.decode_wav(payload)
    assert (r, c) == (rate, 1)
    assert np.array_equal(samples, tone)
    # a pure tone concentrates energy in one rFFT band
    bands = mc.spectral_bands(samples, 16)
    assert abs(np.linalg.norm(bands) - 1.0) < 1e-6
    assert bands.max() > 0.9


def test_y4m_roundtrip_and_frame_count():
    frames = np.stack(
        [np.full((6, 8), 10 * f, np.uint8) for f in range(5)]
    )
    payload = mc.encode_y4m(frames)
    assert mc.sniff(payload) == "y4m"
    out = mc.decode_y4m(payload)
    assert np.array_equal(out, frames)


def test_resize_nearest_golden():
    img = np.arange(4, dtype=np.uint8).reshape(2, 2)
    up = mc.resize_nearest(img, 4, 4)
    assert up.tolist() == [
        [0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]
    ]


def test_luma_histogram_unit_norm():
    img = np.zeros((8, 8, 3), np.uint8)
    v = mc.luma_histogram(img, 16)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6
    assert v[0] == 1.0  # all-black → all mass in bin 0


def test_sniff_rejects_unknown():
    assert mc.sniff(b"\x89PNG\r\n\x1a\n....") == "png"  # real codec now
    assert mc.sniff(b"\xff\xd8\xff\xe0 jpeg") is None
    assert mc.sniff(b"\x00\x01\x02") is None


def _png_chunks(color_type, w, h, scanlines, extra=b""):
    """Hand-rolled PNG for the non-RGB color paths."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        mc.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + extra
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_every_filter():
    img = np.random.RandomState(3).randint(0, 256, (9, 7, 3)).astype(np.uint8)
    for f in (0, 1, 2, 3, 4, "mixed"):
        payload = mc.encode_png(img, filter_type=f)
        assert mc.sniff(payload) == "png"
        assert np.array_equal(mc.decode_png(payload), img), f


def test_png_gray_palette_rgba_paths():
    import struct
    import zlib

    # gray (color type 0): replicate to RGB
    rows = b"".join(b"\x00" + bytes([10 * x for x in range(4)]) for _ in range(2))
    out = mc.decode_png(_png_chunks(0, 4, 2, rows))
    assert out.shape == (2, 4, 3)
    assert np.array_equal(out[..., 0], out[..., 2])
    assert out[0, 3, 0] == 30

    # palette (color type 3): PLTE-mapped
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    pchunk = (
        struct.pack(">I", len(plte))
        + b"PLTE"
        + plte
        + struct.pack(">I", zlib.crc32(b"PLTE" + plte) & 0xFFFFFFFF)
    )
    rows = b"\x00\x00\x01\x02"  # one row: red green blue
    out = mc.decode_png(_png_chunks(3, 3, 1, rows, extra=pchunk))
    assert out.tolist() == [[[255, 0, 0], [0, 255, 0], [0, 0, 255]]]

    # RGBA (color type 6): alpha dropped
    rows = b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 0])
    out = mc.decode_png(_png_chunks(6, 2, 1, rows))
    assert out.tolist() == [[[1, 2, 3], [4, 5, 6]]]

    # gray+alpha (color type 4): luma replicated
    rows = b"\x00" + bytes([9, 255, 200, 0])
    out = mc.decode_png(_png_chunks(4, 2, 1, rows))
    assert out.tolist() == [[[9, 9, 9], [200, 200, 200]]]


def test_png_rejects_unsupported():
    import struct

    img = np.zeros((2, 2, 3), np.uint8)
    good = mc.encode_png(img)
    with pytest.raises(ValueError):
        mc.decode_png(b"notapng")
    # 16-bit depth
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = good[:16] + bad_ihdr + good[16 + len(bad_ihdr):]
    with pytest.raises(ValueError):
        mc.decode_png(bad)
    # Adam7 interlace
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = good[:16] + bad_ihdr + good[16 + len(bad_ihdr):]
    with pytest.raises(ValueError):
        mc.decode_png(bad)


def test_png_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
        f=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
    )
    def png(w, h, seed, f):
        img = np.random.RandomState(seed).randint(
            0, 256, (h, w, 3)
        ).astype(np.uint8)
        assert np.array_equal(
            mc.decode_png(mc.encode_png(img, filter_type=f)), img
        )

    png()


def test_codec_roundtrips_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24), h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    def bmp_ppm(w, h, seed):
        img = np.random.RandomState(seed).randint(
            0, 256, (h, w, 3)
        ).astype(np.uint8)
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
        assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(0, 400), rate=st.sampled_from([8000, 16000, 44100]),
        ch=st.integers(1, 2), seed=st.integers(0, 2**31 - 1),
    )
    def wav(n, rate, ch, seed):
        x = np.random.RandomState(seed).randint(
            -(2**15), 2**15, n * ch
        ).astype(np.int16)
        s, r, c = mc.decode_wav(mc.encode_wav(x, rate, ch))
        assert (r, c) == (rate, ch)
        assert np.array_equal(s, x)

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 12), h=st.integers(1, 12),
        n=st.integers(0, 6), seed=st.integers(0, 2**31 - 1),
    )
    def y4m(w, h, n, seed):
        frames = np.random.RandomState(seed).randint(
            0, 256, (n, 2 * h, 2 * w)
        ).astype(np.uint8)
        assert np.array_equal(mc.decode_y4m(mc.encode_y4m(frames)), frames)

    bmp_ppm()
    wav()
    y4m()
