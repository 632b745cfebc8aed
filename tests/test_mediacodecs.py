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
    assert mc.sniff(b"\xff\xd8\xff\xe0 jpeg") == "jpeg"  # real codec now
    assert mc.sniff(b"GIF89a......") == "gif"  # real codec now
    assert mc.sniff(b"ID3\x04 mp3") is None  # still stubbed (needs ffmpeg)
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


# ---------------------------------------------------------------------------
# GIF


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_gif_roundtrip_exact_palette():
    rng = np.random.RandomState(3)
    for ncol in (2, 16, 255, 256):
        pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        img = pal[rng.randint(0, ncol, (21, 17))]
        enc = mc.encode_gif(img)
        assert mc.sniff(enc) == "gif"
        assert np.array_equal(mc.decode_gif(enc), img)
        assert mc.gif_frame_count(enc) == 1


def test_gif_lzw_code_growth_and_table_reset():
    # >4096 distinct strings force 12-bit codes AND an encoder table
    # reset (clear + rebuild) — the full LZW state machine
    rng = np.random.RandomState(4)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 256, (310, 290))]
    assert np.array_equal(mc.decode_gif(mc.encode_gif(img)), img)


def test_gif_quantized_many_colors():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    dec = mc.decode_gif(mc.encode_gif(img))
    # 3-3-2 cube: worst-case per-channel error is bounded
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 64
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 24


def test_gif_interlaced_decode():
    # hand-assemble an interlaced stream: rows stored in the 4-pass
    # schedule must come back in display order
    import struct

    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    h, w = 13, 9
    idx = rng.randint(0, 16, (h, w)).astype(np.uint8)
    passes = [idx[s::k] for s, k in ((0, 8), (4, 8), (2, 4), (1, 2))]
    stored = np.concatenate(passes, axis=0)
    body = mc._lzw_encode(stored.ravel(), 4)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 3, 0, 0)  # 16-entry GCT
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(4)
    for i in range(0, len(body), 255):
        blk = body[i : i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"
    assert np.array_equal(mc.decode_gif(bytes(out)), pal[idx])


def test_gif_multi_frame_count_and_first_frame():
    # two image blocks with LOCAL color tables; decode returns frame 1
    # composited on the logical screen, frame count sees both
    import struct

    rng = np.random.RandomState(7)
    pal1 = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    pal2 = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    f1 = rng.randint(0, 4, (6, 6)).astype(np.uint8)
    f2 = rng.randint(0, 4, (6, 6)).astype(np.uint8)

    def frame(pal, idx):
        blk = bytearray(
            b"\x2c" + struct.pack("<HHHHB", 0, 0, 6, 6, 0x80 | 1)
        )
        blk += pal.tobytes()
        body = mc._lzw_encode(idx.ravel(), 2)
        blk.append(2)
        for i in range(0, len(body), 255):
            b = body[i : i + 255]
            blk.append(len(b))
            blk += b
        blk.append(0)
        return blk

    out = bytearray(b"GIF89a") + struct.pack("<HHBBB", 6, 6, 0, 0, 0)
    out += frame(pal1, f1) + frame(pal2, f2) + b"\x3b"
    assert mc.gif_frame_count(bytes(out)) == 2
    assert np.array_equal(mc.decode_gif(bytes(out)), pal1[f1])


def test_gif_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 24), h=st.integers(1, 24),
        ncol=st.integers(1, 256), seed=st.integers(0, 2**31 - 1),
    )
    def gif(w, h, ncol, seed):
        rng = np.random.RandomState(seed)
        pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        img = pal[rng.randint(0, ncol, (h, w))]
        assert np.array_equal(mc.decode_gif(mc.encode_gif(img)), img)

    gif()


# ---------------------------------------------------------------------------
# JPEG


def test_jpeg_roundtrip_psnr_444_and_420():
    rng = np.random.RandomState(8)
    for h, w in ((8, 8), (16, 24), (33, 47), (70, 21)):
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        img = np.stack(
            [
                np.broadcast_to((x * 3 + y * 2) % 256, (h, w)),
                np.broadcast_to((y * 5) % 256, (h, w)),
                np.full((h, w), 77),
            ],
            axis=-1,
        ).astype(np.uint8)
        for ss in (False, True):
            enc = mc.encode_jpeg(img, subsample=ss)
            assert mc.sniff(enc) == "jpeg"
            dec = mc.decode_jpeg(enc)
            assert dec.shape == img.shape
            assert _psnr(dec, img) > (27 if ss else 30)


def test_jpeg_constant_color_near_exact():
    img = np.full((24, 24, 3), 128, np.uint8)
    dec = mc.decode_jpeg(mc.encode_jpeg(img))
    assert np.abs(dec.astype(int) - 128).max() <= 2


def test_jpeg_byte_stuffing_exercised():
    # noise coefficients make 0xFF entropy bytes near-certain: the
    # decoder must see stuffed FF 00 pairs and unstuff them
    rng = np.random.RandomState(13)  # this seed provably emits FF bytes
    img = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    enc = mc.encode_jpeg(img)
    assert b"\xff\x00" in enc
    dec = mc.decode_jpeg(enc)
    assert _psnr(dec, img) > 12  # q50 destroys noise; shape + decode sanity


def test_jpeg_rejects_progressive_and_non_jpeg():
    import struct

    with pytest.raises(ValueError):
        mc.decode_jpeg(b"nope")
    # minimal SOF2 (progressive) stream
    sof2 = bytearray(b"\xff\xd8")
    data = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    sof2 += b"\xff\xc2" + (len(data) + 2).to_bytes(2, "big") + data
    sof2 += b"\xff\xd9"
    with pytest.raises(ValueError, match="SOF"):
        mc.decode_jpeg(bytes(sof2))


def test_jpeg_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(1, 32), h=st.integers(1, 32),
        seed=st.integers(0, 2**31 - 1), ss=st.booleans(),
    )
    def jpeg(w, h, seed, ss):
        rng = np.random.RandomState(seed)
        # smooth-ish image: low-frequency content survives q50 well
        base = rng.randint(0, 256, (3,))
        y = np.arange(h)[:, None]
        x = np.arange(w)[None, :]
        img = np.clip(
            base[None, None, :]
            + (x // 8 * 10 + y // 8 * 6)[:, :, None],
            0,
            255,
        ).astype(np.uint8)
        dec = mc.decode_jpeg(mc.encode_jpeg(img, subsample=ss))
        assert dec.shape == img.shape
        assert _psnr(dec, img) > 24

    jpeg()


def test_gif_animated_roundtrip_and_compositing():
    rng = np.random.RandomState(12)
    pal = rng.randint(0, 256, (40, 3)).astype(np.uint8)
    frames = pal[rng.randint(0, 40, (5, 18, 22))]
    enc = mc.encode_gif_frames(frames)
    assert mc.sniff(enc) == "gif"
    assert mc.gif_frame_count(enc) == 5
    assert np.array_equal(mc.decode_gif_frames(enc), frames)
    # decode_gif returns the FIRST frame of an animation
    assert np.array_equal(mc.decode_gif(enc), frames[0])
    # single-frame streams round through the frames API too
    one = mc.encode_gif(frames[0])
    assert mc.decode_gif_frames(one).shape == (1, 18, 22, 3)


def test_gif_animated_many_colors_quantized():
    rng = np.random.RandomState(14)
    frames = rng.randint(0, 256, (3, 16, 16, 3)).astype(np.uint8)
    dec = mc.decode_gif_frames(mc.encode_gif_frames(frames))
    assert dec.shape == frames.shape
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 64


def test_jpeg_restart_intervals_and_grayscale():
    """DRI/RSTn emission with DC-predictor resets must decode
    bit-identically to the restart-free stream (restarts change the
    entropy framing, never the coefficients); grayscale (1-component)
    streams decode with luma replicated to RGB."""
    rng = np.random.RandomState(2)
    img = np.clip(
        rng.randint(0, 50, (48, 64, 3)).cumsum(axis=1) % 256, 0, 255
    ).astype(np.uint8)
    for ss in (False, True):
        ref = mc.decode_jpeg(mc.encode_jpeg(img, subsample=ss))
        for R in (1, 2, 5, 7):
            enc = mc.encode_jpeg(img, subsample=ss, restart_interval=R)
            assert b"\xff\xdd" in enc  # DRI present
            assert np.array_equal(mc.decode_jpeg(enc), ref), (ss, R)
    gray = img[:, :, 0]
    ref = mc.decode_jpeg(mc.encode_jpeg(gray))
    assert ref.shape == (48, 64, 3)
    assert np.array_equal(ref[:, :, 0], ref[:, :, 2])  # replicated luma
    enc = mc.encode_jpeg(gray, restart_interval=3)
    assert np.array_equal(mc.decode_jpeg(enc), ref)
