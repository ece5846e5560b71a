"""Pixel-exact tests for the pure-numpy image codecs (BMP / PPM / PNG)
and the real multimodal decode path built on them."""

import struct
import zlib

import numpy as np
import pytest

from data_pipeline_with_spark_spark.llm import codecs, multimodal


def test_bmp_round_trip_exact():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (2, 3), (5, 4), (16, 24), (7, 13)]:  # incl. padded widths
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(arr)), arr)


def test_bmp_bytes_handwritten():
    # 1x2 image: left pixel pure red, right pure blue. 2*3=6 row bytes,
    # padded to 8; file = 14 + 40 + 8 = 62 bytes.
    arr = np.array([[[255, 0, 0], [0, 0, 255]]], dtype=np.uint8)
    data = codecs.encode_bmp(arr)
    assert len(data) == 62
    assert data[:2] == b"BM"
    assert int.from_bytes(data[2:6], "little") == 62          # file size
    assert int.from_bytes(data[10:14], "little") == 54        # data offset
    assert int.from_bytes(data[18:22], "little") == 2         # width
    assert int.from_bytes(data[22:26], "little") == 1         # height
    assert int.from_bytes(data[28:30], "little") == 24        # bpp
    # Pixels are BGR: red -> 00 00 FF, blue -> FF 00 00, then 2 pad bytes.
    assert data[54:62] == bytes([0, 0, 255, 255, 0, 0, 0, 0])
    assert np.array_equal(codecs.decode_bmp(data), arr)


def test_bmp_grayscale_and_errors():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    rgb = codecs.decode_bmp(codecs.encode_bmp(gray))
    assert np.array_equal(rgb[:, :, 0], gray)
    assert np.array_equal(rgb[:, :, 1], gray)
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_bmp(b"nope")
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_bmp(codecs.encode_bmp(gray)[:40])  # truncated


def test_ppm_round_trip_and_handwritten():
    arr = np.array([[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8)
    data = codecs.encode_ppm(arr)
    assert data == b"P6\n2 2\n255\n" + bytes(range(1, 13))
    assert np.array_equal(codecs.decode_ppm(data), arr)
    # comment + arbitrary whitespace in header is legal Netpbm
    wonky = b"P6 # cmt\n 2\t2 # another\n 255\n" + bytes(range(1, 13))
    assert np.array_equal(codecs.decode_ppm(wonky), arr)
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))


def _png_with_rows(h, w, rows_filtered, color_type=2, extra=b""):
    """Assemble a PNG from pre-filtered scanlines (handwritten-bytes
    harness mirroring the BMP suite: exercises the DECODER against
    spec-authored streams, not just our own encoder's output)."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + extra
        + codecs._png_chunk(b"IDAT", zlib.compress(b"".join(rows_filtered)))
        + codecs._png_chunk(b"IEND", b"")
    )


def _png_filter_row(img, y, ft, bpp=3):
    """Apply PNG filter ``ft`` to row ``y`` exactly as the W3C spec
    defines it (independent reimplementation the decoder must invert)."""
    row = img[y].reshape(-1).astype(np.int32)
    prior = (
        img[y - 1].reshape(-1).astype(np.int32)
        if y > 0
        else np.zeros_like(row)
    )
    out = np.zeros_like(row)
    for x in range(len(row)):
        a = int(row[x - bpp]) if x >= bpp else 0
        b = int(prior[x])
        c = int(prior[x - bpp]) if x >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (int(row[x]) - pred) & 0xFF
    return bytes([ft]) + bytes(out.astype(np.uint8))


def test_png_round_trip_exact():
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 3), (5, 4), (16, 24), (7, 13)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_png(codecs.encode_png(arr)), arr)
    # grayscale encodes color type 0 and decodes replicated, like BMP
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = codecs.decode_png(codecs.encode_png(gray))
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_png_all_filters_decode():
    # One stream exercising every filter type (None/Sub/Up/Average/
    # Paeth) across rows — the decoder must invert each against the
    # reconstructed (not filtered) prior row, per spec.
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
    rows = [_png_filter_row(img, y, ft) for y, ft in enumerate([0, 1, 2, 3, 4])]
    assert np.array_equal(codecs.decode_png(_png_with_rows(5, 3, rows)), img)
    rows = [_png_filter_row(img, y, ft) for y, ft in enumerate([4, 3, 4, 1, 2])]
    assert np.array_equal(codecs.decode_png(_png_with_rows(5, 3, rows)), img)


def test_png_palette_alpha_variants():
    rng = np.random.default_rng(5)
    # color type 3: palette lookup through PLTE
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (3, 4), dtype=np.uint8)
    rows = [bytes([0]) + bytes(idx[y]) for y in range(3)]
    png3 = _png_with_rows(
        3, 4, rows, color_type=3, extra=codecs._png_chunk(b"PLTE", pal.tobytes())
    )
    assert np.array_equal(codecs.decode_png(png3), pal[idx])
    # color type 6 (RGBA): alpha dropped
    rgba = rng.integers(0, 256, (2, 3, 4), dtype=np.uint8)
    rows = [bytes([0]) + bytes(rgba[y].reshape(-1)) for y in range(2)]
    assert np.array_equal(
        codecs.decode_png(_png_with_rows(2, 3, rows, 6)), rgba[:, :, :3]
    )
    # color type 4 (gray+alpha): luma replicated, alpha dropped
    ga = rng.integers(0, 256, (2, 3, 2), dtype=np.uint8)
    rows = [bytes([0]) + bytes(ga[y].reshape(-1)) for y in range(2)]
    assert np.array_equal(
        codecs.decode_png(_png_with_rows(2, 3, rows, 4)),
        np.repeat(ga[:, :, :1], 3, axis=2),
    )


def test_png_errors_and_validation():
    arr = np.full((2, 2, 3), 7, dtype=np.uint8)
    good = codecs.encode_png(arr)
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_png(b"not a png")
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_png(good[:30])  # truncated chunk
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # flip an IHDR byte -> CRC mismatch
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_png(bytes(corrupt))
    # 16-bit depth raises honestly
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    p16 = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr16)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(2 * (1 + 12))))
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_png(p16)
    # Adam7 interlace raises honestly
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    pi = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr_i)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(14)))
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_png(pi)
    # palette index past PLTE raises
    rows = [bytes([0, 9, 0]), bytes([0, 0, 0])]
    bad_pal = _png_with_rows(
        2, 2, rows, color_type=3, extra=codecs._png_chunk(b"PLTE", bytes(9))
    )
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_png(bad_pal)


def test_png_through_multimodal_decode_path():
    # The PNG container flows through the SAME real-decode boundary as
    # BMP: pixel-sum checksum, luma histogram, resize re-encode.
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = multimodal.decode_image_stub(codecs.encode_png(gray), fake=False)
    assert out["checksum"] == int(gray.sum())
    resized = multimodal.resize_image_stub(codecs.encode_png(gray), 4, 4, fake=False)
    assert codecs.sniff_format(resized) == "png"
    dec = codecs.to_grayscale(codecs.decode_image(resized))
    assert np.array_equal(dec, codecs.resize_nearest(gray, 4, 4))


def test_grayscale_luma_exact():
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 10, 10]]], dtype=np.uint8)
    gray = codecs.to_grayscale(rgb)
    # integer BT.601: floor((299R + 587G + 114B)/1000)
    assert gray.tolist() == [[76, 149, 29, 10]]
    # gray payloads decode to exactly their byte value
    g = np.array([[0, 128, 255]], dtype=np.uint8)
    assert codecs.to_grayscale(codecs.decode_bmp(codecs.encode_bmp(g))).tolist() == [
        [0, 128, 255]
    ]


def test_resize_nearest_handwritten():
    img = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    up = codecs.resize_nearest(img, 4, 4)
    assert up.tolist() == [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]]
    down = codecs.resize_nearest(up, 2, 2)
    assert down.tolist() == img.tolist()
    rgb = np.stack([img, img + 10, img + 20], axis=2)
    up3 = codecs.resize_nearest(rgb, 4, 4)
    assert up3.shape == (4, 4, 3)
    assert np.array_equal(up3[:, :, 0], up)


def test_decode_image_dispatch():
    arr = np.full((2, 2, 3), 9, dtype=np.uint8)
    assert np.array_equal(codecs.decode_image(codecs.encode_image(arr, "bmp")), arr)
    assert np.array_equal(codecs.decode_image(codecs.encode_image(arr, "ppm")), arr)
    assert np.array_equal(codecs.decode_image(codecs.encode_image(arr, "png")), arr)
    assert codecs.sniff_format(codecs.encode_png(arr)) == "png"
    # JPEG sniffs too since r10 (real baseline codec)
    assert codecs.sniff_format(b"\xff\xd8\xff\xe0" + bytes(16)) == "jpeg"
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_image(b"\xff\xd8\xff\xe0" + bytes(16))
    # a PNG signature with a garbage body is not silently accepted
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_decode_asset_real_pixels_no_fake_needed():
    # Real container -> real decode even with fake=False.
    gray = np.array([[0, 16], [32, 255]], dtype=np.uint8)
    out = multimodal.decode_image_stub(codecs.encode_bmp(gray), fake=False)
    assert out["checksum"] == 0 + 16 + 32 + 255
    # histogram bins are v//16: {0:1, 1:1, 2:1, 15:1} over 4 pixels
    assert out["features"][0] == 0.25
    assert out["features"][1] == 0.25
    assert out["features"][2] == 0.25
    assert out["features"][15] == 0.25
    assert sum(out["features"]) == pytest.approx(1.0)


def test_resize_real_container_round_trip():
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    resized = multimodal.resize_image_stub(codecs.encode_bmp(gray), 4, 4, fake=False)
    dec = codecs.to_grayscale(codecs.decode_image(resized))
    assert np.array_equal(dec, codecs.resize_nearest(gray, 4, 4))


def test_attach_image_payload_generator_formula(spark):
    df = spark.createDataFrame([(3, "x"), (7, "y")], ["doc_id", "text"])
    assets = multimodal.attach_image_payload(df, width=4, height=2)
    rows = {r.doc_id: r for r in assets.collect()}
    for d in (3, 7):
        img = codecs.to_grayscale(codecs.decode_image(bytes(rows[d].payload)))
        expect = ((d * 177 + np.arange(8) * 55) % 256).reshape(2, 4)
        assert np.array_equal(img, expect)
        assert rows[d].meta.mime == "image/bmp"
        assert rows[d].meta.width == 4


def test_extract_features_real_decode_end_to_end(spark):
    df = spark.createDataFrame([(5, "a")], ["doc_id", "text"])
    assets = multimodal.attach_image_payload(df, width=24, height=16)
    feats = multimodal.extract_features(assets, fake=False).collect()[0]
    px = (5 * 177 + np.arange(384) * 55) % 256
    assert feats.checksum == int(px.sum())
    hist = np.bincount(px // 16, minlength=16)
    assert feats.features == pytest.approx((hist / 384).tolist())
    assert feats.n_bytes == 54 + 16 * 72  # BMP header + rows


def test_phash_real_pixels_identical_and_perturbed(spark):
    # Same generator id -> byte-identical image -> hamming 0; a copy
    # with a few flipped pixels stays within a small hamming distance;
    # a very different image does not collide at <=4.
    base = np.minimum(np.add.outer(np.arange(32) * 6, np.arange(32) * 3), 255).astype(
        np.uint8
    )  # smooth diagonal gradient — the regime pHash is designed for
    near = base.copy()
    near[3, 3] ^= 0x08
    near[20, 11] ^= 0x04
    far = (((np.arange(32)[:, None] // 8 + np.arange(32)[None, :] // 8) % 2) * 255).astype(
        np.uint8
    )  # 8px checkerboard: very different spectrum
    df = spark.createDataFrame(
        [
            (1, bytearray(codecs.encode_bmp(base))),
            (2, bytearray(codecs.encode_bmp(base))),
            (3, bytearray(codecs.encode_bmp(near))),
            (4, bytearray(codecs.encode_bmp(far))),
        ],
        "doc_id long, payload binary",
    )
    hashed = multimodal.perceptual_hash(df, fake=False)
    hs = {r.doc_id: r.phash for r in hashed.collect()}
    assert hs[1] == hs[2]
    assert bin(hs[1] ^ hs[3]).count("1") <= 8
    assert bin(hs[1] ^ hs[4]).count("1") > 8
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.phash_near_dup_pairs(hashed, max_hamming=4).collect()
    }
    assert pairs[(1, 2)] == 0


def test_wav_round_trip_and_handwritten():
    samples = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    data = codecs.encode_wav(samples, 8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    # 44-byte canonical header + 10 bytes of PCM
    assert len(data) == 44 + 10
    assert int.from_bytes(data[24:28], "little") == 8000   # sample rate
    assert int.from_bytes(data[34:36], "little") == 16     # bits
    dec, rate = codecs.decode_wav(data)
    assert rate == 8000
    assert dec.shape == (5, 1)
    assert dec[:, 0].tolist() == samples.tolist()
    # stereo round trip
    st = np.array([[1, -1], [2, -2]], dtype=np.int16)
    dec2, _ = codecs.decode_wav(codecs.encode_wav(st, 44100))
    assert dec2.tolist() == st.tolist()
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_wav(b"RIFFxxxxNOPE")
    assert codecs.sniff_media(data) == "wav"
    assert codecs.sniff_media(b"BMxxxx" + bytes(60)) == "bmp"


def test_audio_features_real_decode_end_to_end(spark):
    df = spark.createDataFrame([(9, "x")], ["doc_id", "text"])
    assets = multimodal.attach_audio_payload(df, n_samples=2048, sample_rate=8000)
    feats = multimodal.extract_audio_features(assets).collect()[0]
    smp = ((9 * 31 + np.arange(2048) * 7) % 2001) - 1000
    assert feats.n_samples == 2048 and feats.sample_rate == 8000
    assert feats.duration_ms == 256
    assert feats.rms == int(np.floor(np.sqrt((smp * smp).mean()) + 0.5))
    assert feats.zero_crossings == int(((smp[1:] * smp[:-1]) < 0).sum())
    assert feats.peak == int(np.abs(smp).max())


def test_y4m_round_trip_and_handwritten():
    frames = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    data = codecs.encode_y4m(frames, fps=(30, 1))
    assert data.startswith(b"YUV4MPEG2 W3 H2 F30:1 Ip A1:1 Cmono\n")
    # body: FRAME marker + 6 luma bytes, twice
    assert data.count(b"FRAME\n") == 2
    dec, fps = codecs.decode_y4m(data)
    assert fps == (30, 1)
    assert np.array_equal(dec, frames)
    assert codecs.sniff_media(data) == "y4m"
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_y4m(b"YUV4MPEG2 W2 H2 C420\n" + b"FRAME\n" + bytes(6))
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_y4m(data[:-3])  # truncated last frame


def test_video_ops_real_decode_end_to_end(spark):
    df = spark.createDataFrame([(4, "x")], ["doc_id", "text"])
    assets = multimodal.attach_video_payload(df, n_frames=8, width=16, height=8)
    mot = multimodal.video_motion_features(assets).collect()[0]
    idx = np.arange(128)
    fr = np.stack([((4 * 177 + f * 131 + idx * 55) % 256) for f in range(8)])
    assert mot.n_frames == 8
    assert mot.luma_total == int(fr.sum())
    assert mot.motion_sad == int(np.abs(fr[1:] - fr[:-1]).sum())

    frames = multimodal.sample_video_frames(assets, every_nth=2).collect()
    assert sorted(r.frame_idx for r in frames) == [0, 2, 4, 6]
    for r in frames:
        # each sampled frame is a standalone BMP of the right plane
        img = codecs.to_grayscale(codecs.decode_image(bytes(r.frame)))
        assert np.array_equal(img.ravel(), fr[r.frame_idx].astype(np.uint8))
        assert r.luma_sum == int(fr[r.frame_idx].sum())


def test_fake_path_survives_missniffed_payloads():
    # r6 review: arbitrary bytes starting 'BM' or 'P6' must fall back to
    # the deterministic fake decode under fake=True (pre-real-codec
    # behavior), and only raise when fake=False.
    for payload in (b"BMx" + bytes(60), b"P6 broken header", b"BM"):
        out = multimodal.decode_image_stub(payload, fake=True)
        assert out["n_bytes"] == len(payload)
        assert out["checksum"] == sum(payload) % (2**32)
        with pytest.raises((codecs.UnsupportedImageError, ValueError, NotImplementedError)):
            multimodal.decode_image_stub(payload, fake=False)
        resized = multimodal.resize_image_stub(payload, 4, 4, fake=True)
        assert len(resized) == 16


# --------------------------------------------------------------------------
# JPEG (baseline sequential, pure-numpy T.81 codec — r10)


def test_jpeg_flat_blocks_quality100_bit_exact():
    # The property the oracle-checked entry rests on: block-constant
    # image + unit quantizer (q=100) -> DC-only blocks -> exact decode.
    rng = np.random.RandomState(3)
    blocks = rng.randint(0, 256, (2, 3))
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=100))
    assert out.shape == (16, 24, 3)
    for c in range(3):  # grayscale replicates to 3 channels
        assert np.array_equal(out[:, :, c], img)


def test_jpeg_gray_gradient_tolerance_and_quality_ordering():
    g = np.tile((np.arange(48, dtype=np.int64) * 5 % 256).astype(np.uint8), (16, 1))
    errs = []
    for q in (50, 90, 100):
        dec = codecs.decode_jpeg(codecs.encode_jpeg(g, quality=q))[:, :, 0]
        errs.append(int(np.abs(dec.astype(int) - g.astype(int)).max()))
    # error shrinks (weakly) as quality rises, and q>=90 is near-exact
    assert errs[0] >= errs[1] >= errs[2] and errs[1] <= 2


def test_jpeg_rgb_color_round_trip_tolerance():
    rng = np.random.RandomState(11)
    base = np.array([120, 60, 200])
    rgb = np.clip(base[None, None, :] + rng.randint(-15, 15, (24, 40, 3)), 0, 255).astype(np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(rgb, quality=95)).astype(int)
    assert dec.shape == rgb.shape
    assert np.abs(dec - rgb.astype(int)).mean() < 6  # lossy but faithful


def test_jpeg_odd_dimensions_edge_padding():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (13, 21)).astype(np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=100))
    assert dec.shape == (13, 21, 3)
    # q=100 on arbitrary content is not exact, but must be very close
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 3


def test_jpeg_dc_extremes_and_dpcm_chain():
    # black and white blocks exercise the largest DC categories and the
    # DPCM predictor across blocks (diff = +/- 2040 at q=100)
    img = np.repeat(np.repeat(np.array([[0, 255, 0], [255, 0, 255]]), 8, 0), 8, 1).astype(np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=100))
    assert np.array_equal(out[:, :, 0], img)


def test_jpeg_sniff_and_dispatch():
    img = np.repeat(np.repeat(np.arange(6, dtype=np.uint8).reshape(2, 3) * 40, 8, 0), 8, 1)
    rgb = np.stack([img] * 3, 2)
    data = codecs.encode_image(rgb, "jpeg")
    assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
    assert codecs.sniff_format(data) == "jpeg"
    assert codecs.sniff_media(data) == "jpeg"
    assert np.array_equal(codecs.decode_image(data), rgb)


def test_jpeg_handwritten_single_block_dc_only():
    # Hand-author a minimal 8x8 gray JPEG: unit quantizer, Annex K
    # tables, one DC-only block of value 130 (diff=+16 after the level
    # shift: DC = 8*(130-128) = 16, category 5, bits 10000).
    import struct as st

    out = bytearray(b"\xff\xd8")
    qtab = np.ones((8, 8), dtype=np.int64)
    out += codecs._jpeg_dqt_segment(0, qtab)
    sof = bytes([8]) + st.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc0" + st.pack(">H", 2 + len(sof)) + sof
    out += codecs._jpeg_dht_segment(0, 0, codecs._JPEG_DC_LUMA)
    out += codecs._jpeg_dht_segment(1, 0, codecs._JPEG_AC_LUMA)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + st.pack(">H", 2 + len(sos)) + sos
    bw = codecs._BitWriter()
    dc = codecs._huffman_canonical(*codecs._JPEG_DC_LUMA)
    ac = codecs._huffman_canonical(*codecs._JPEG_AC_LUMA)
    code, ln = dc[5]
    bw.write(code, ln)
    bw.write(16, 5)  # magnitude bits of +16
    code, ln = ac[0x00]  # EOB
    bw.write(code, ln)
    out += bw.flush() + b"\xff\xd9"
    dec = codecs.decode_jpeg(bytes(out))
    assert dec.shape == (8, 8, 3) and (dec == 130).all()


def test_jpeg_handwritten_420_subsampled_decodes():
    # Hand-author a 4:2:0 stream: 16x16, Y sampled 2x2 (4 Y blocks per
    # MCU), Cb/Cr 1x1 — flat gray 100 (Cb=Cr=128 -> DC diff 0).
    import struct as st

    out = bytearray(b"\xff\xd8")
    out += codecs._jpeg_dqt_segment(0, np.ones((8, 8), dtype=np.int64))
    sof = bytes([8]) + st.pack(">HH", 16, 16) + bytes(
        [3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    out += b"\xff\xc0" + st.pack(">H", 2 + len(sof)) + sof
    out += codecs._jpeg_dht_segment(0, 0, codecs._JPEG_DC_LUMA)
    out += codecs._jpeg_dht_segment(1, 0, codecs._JPEG_AC_LUMA)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + st.pack(">H", 2 + len(sos)) + sos
    bw = codecs._BitWriter()
    dc = codecs._huffman_canonical(*codecs._JPEG_DC_LUMA)
    ac = codecs._huffman_canonical(*codecs._JPEG_AC_LUMA)

    def dc_only(diff):
        cat = codecs._jpeg_category(diff)
        code, ln = dc[cat]
        bw.write(code, ln)
        if cat:
            bw.write(codecs._jpeg_magnitude_bits(diff, cat), cat)
        code, ln = ac[0x00]
        bw.write(code, ln)

    # one MCU: 4 Y blocks (first diff -224 = 8*(100-128), rest 0),
    # then Cb (diff 0 from pred 0? no: DC = 8*(128-128) = 0), Cr
    dc_only(8 * (100 - 128))
    for _ in range(3):
        dc_only(0)
    dc_only(0)  # Cb
    dc_only(0)  # Cr
    out += bw.flush() + b"\xff\xd9"
    dec = codecs.decode_jpeg(bytes(out))
    assert dec.shape == (16, 16, 3) and (dec == 100).all()


def test_jpeg_rejects_progressive_truncated_and_garbage():
    img = np.full((8, 8), 90, dtype=np.uint8)
    data = bytearray(codecs.encode_jpeg(img, quality=100))
    # a baseline stream RELABELED SOF2 is not a valid progressive file
    # (its single SOS covers Ss=0..Se=63; a progressive DC scan must
    # have Se=0) — honest rejection, r14: real SOF2 files now decode
    i = bytes(data).index(b"\xff\xc0")
    prog = bytes(data[:i]) + b"\xff\xc2" + bytes(data[i + 2 :])
    with pytest.raises(codecs.UnsupportedImageError, match="Se=0"):
        codecs.decode_jpeg(prog)
    # lossless SOF3 stays rejected
    sof3 = bytes(data[:i]) + b"\xff\xc3" + bytes(data[i + 2 :])
    with pytest.raises(codecs.UnsupportedImageError, match="SOF3"):
        codecs.decode_jpeg(sof3)
    # truncated entropy stream
    with pytest.raises(codecs.UnsupportedImageError):
        codecs.decode_jpeg(bytes(data[: len(data) // 2]))
    # not a JPEG at all
    with pytest.raises(codecs.UnsupportedImageError, match="not a JPEG"):
        codecs.decode_jpeg(b"\xff\xd9 nope")


def test_jpeg_payload_entry_pipeline(spark):
    # The catalog entry's Spark side: block-constant payloads decode
    # through the REAL entropy decoder to exactly the generator formula.
    df = spark.range(7).withColumnRenamed("id", "doc_id")
    assets = multimodal.attach_jpeg_payload(df)
    rows = assets.select("doc_id", "payload", "meta").collect()
    for r in rows:
        img = codecs.decode_image(bytes(r.payload))
        gray = codecs.to_grayscale(img)
        for by in range(2):
            for bx in range(3):
                expect = (r.doc_id * 177 + (by * 3 + bx) * 55) % 256
                block = gray[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                assert (block == expect).all()
        assert r.meta.mime == "image/jpeg"


# ---------------------------------------------------------------------------
# Progressive JPEG (r14: closes the r13 verdict's residual gap #4)


def test_jpeg_progressive_decodes_identically_to_baseline():
    # Same quality → same quantized coefficients → the progressive
    # decode must be BIT-IDENTICAL to the baseline decode (shared
    # reconstruction math). Shapes chosen to cover non-multiple-of-8
    # dims, grayscale, and qualities that populate every successive-
    # approximation bit depth.
    rng = np.random.default_rng(7)
    cases = [((16, 24), 90), ((24, 16, 3), 90), ((17, 19, 3), 75),
             ((8, 8), 100), ((40, 40, 3), 50)]
    for shape, q in cases:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=q))
        pb = codecs.encode_jpeg_progressive(img, quality=q)
        assert b"\xff\xc2" in pb  # really SOF2
        assert np.array_equal(codecs.decode_jpeg(pb), base), (shape, q)
    # smooth gradient (long EOB runs) and constant (all-EOB) images
    grad = np.tile(np.arange(64, dtype=np.uint8) * 4, (32, 1))
    flat = np.full((24, 24, 3), 130, dtype=np.uint8)
    for img, q in ((grad, 85), (flat, 90)):
        base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=q))
        assert np.array_equal(
            codecs.decode_jpeg(codecs.encode_jpeg_progressive(img, quality=q)),
            base,
        )


def test_jpeg_progressive_scan_script_fuzz():
    # r14 verdict task 8: the EOBn-run/refinement bookkeeping must hold
    # for ANY legal scan script, not just the shipped libjpeg-style one.
    # Random non-block-constant images × random spectral splits × random
    # successive-approximation ladders, decoded and compared against the
    # SEQUENTIAL encoding at the same quality (same quantized
    # coefficients -> bit-identical reconstruction is the invariant).
    rng = np.random.default_rng(2026)
    for trial in range(12):
        shape = (
            int(rng.integers(8, 41)),
            int(rng.integers(8, 41)),
        ) + ((3,) if trial % 2 else ())
        q = int(rng.choice([50, 75, 90, 100]))
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=q))
        # random contiguous partition of 1..63 into 1-4 bands
        n_cuts = int(rng.integers(0, 4))
        cuts = sorted(rng.choice(np.arange(2, 63), size=n_cuts, replace=False))
        bounds = [1, *cuts, 64]
        splits = tuple(
            (bounds[i], bounds[i + 1] - 1) for i in range(len(bounds) - 1)
        )
        ac_al = int(rng.integers(0, 4))
        dc_al = int(rng.integers(0, 3))
        for opt in (True, False):
            pb = codecs.encode_jpeg_progressive(
                img, quality=q, optimize_coding=opt,
                ac_splits=splits, ac_al=ac_al, dc_al=dc_al,
            )
            assert b"\xff\xc2" in pb
            got = codecs.decode_jpeg(pb)
            assert np.array_equal(got, base), (
                shape, q, splits, ac_al, dc_al, opt,
            )
    # malformed scripts refuse loudly
    with pytest.raises(ValueError, match="ac_splits"):
        codecs.encode_jpeg_progressive(
            np.zeros((8, 8), np.uint8), ac_splits=((1, 5), (7, 63)))
    with pytest.raises(ValueError, match="ac_splits"):
        codecs.encode_jpeg_progressive(
            np.zeros((8, 8), np.uint8), ac_splits=((1, 62),))
    with pytest.raises(ValueError, match="shifts"):
        codecs.encode_jpeg_progressive(np.zeros((8, 8), np.uint8), dc_al=9)


def test_jpeg_marker_stream_robustness():
    # r14 advice: EOI must terminate the marker loop BEFORE any seglen
    # read — trailing bytes after EOI, T.81 fill bytes (extra 0xFF
    # padding before a marker), and standalone TEM/RST markers between
    # segments must not derail the parse for either encoding mode.
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    for enc in (codecs.encode_jpeg, codecs.encode_jpeg_progressive):
        b = enc(img, quality=90)
        assert b.endswith(b"\xff\xd9")
        want = codecs.decode_jpeg(b)
        trailing = b + b"\x00\x12garbage after EOI\xff\x00\xff"
        assert np.array_equal(codecs.decode_jpeg(trailing), want)
        # fill bytes + a TEM marker injected right after SOI
        padded = b[:2] + b"\xff\xff\xff\x01" + b[2:]
        assert np.array_equal(codecs.decode_jpeg(padded), want)
        # fill bytes immediately before EOI
        fill_eoi = b[:-2] + b"\xff\xff\xff\xd9"
        assert np.array_equal(codecs.decode_jpeg(fill_eoi), want)


def test_jpeg_progressive_sniffs_and_dispatches():
    # decode_image / the multimodal boundary must serve progressive
    # payloads through the same sniff (magic is the same SOI).
    img = np.random.default_rng(5).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    pb = codecs.encode_jpeg_progressive(img, quality=80)
    assert codecs.sniff_format(pb) == "jpeg"
    out = codecs.decode_image(pb)
    assert out.shape == (16, 16, 3)
    d = multimodal.decode_image_stub(pb)
    assert d["n_bytes"] == len(pb) and len(d["features"]) == multimodal.FEATURE_DIM


def test_jpeg_progressive_ac_codec_property():
    # Coefficient-level round-trip of the AC scan codecs alone, on
    # random sparse/dense patterns: exercises EOBn>1 deferral, ZRL in
    # refinement, interleaved history-correction bits — independent of
    # the DCT/color layers.
    rng = np.random.default_rng(3)
    ac_codes = codecs._huffman_canonical(*codecs._JPEG_AC_PROG)
    amap = codecs._huffman_decode_map(*codecs._JPEG_AC_PROG)
    ss, se = 1, 63
    for trial in range(12):
        nby, nbx = 3, 4
        density = rng.uniform(0.01, 0.5)
        mask = rng.random((nby, nbx, 64)) < density
        vals = rng.integers(-40, 41, size=(nby, nbx, 64))
        coef = np.where(mask, vals, 0).astype(np.int64)
        coef[..., 0] = 0  # AC band only
        streams = []
        bw = codecs._BitWriter()
        codecs._jpeg_emit_ac_first(coef, ss, se, 2, ac_codes, bw)
        streams.append((bw.flush(), codecs._jpeg_ac_first, 2))
        for al in (1, 0):
            bw = codecs._BitWriter()
            codecs._jpeg_emit_ac_refine(coef, ss, se, al, ac_codes, bw)
            streams.append((bw.flush(), codecs._jpeg_ac_refine, al))
        got = np.zeros_like(coef)
        for stream, fn, al in streams:
            br = codecs._BitReader(stream + b"\x00\x00", 0)
            state = {"eobrun": 0}
            for by in range(nby):
                for bx in range(nbx):
                    fn(br, got[by, bx], ss, se, al, amap, state)
        assert np.array_equal(got, coef), trial


def test_jpeg_progressive_hand_authored_stream():
    # Decoder pinned against a HAND-DERIVED T.81 stream (independent of
    # our encoder): 8x8 gray, unit quantizer, coefficients dc=-5,
    # zz[1]=3, zz[4]=-6; scans = DC first Al=1, AC first 1..63 Al=1,
    # AC refine Ah=1->Al=0, DC refine Ah=1->Al=0.
    import struct as _struct

    zz = np.zeros(64, dtype=np.int64)
    zz[0], zz[1], zz[4] = -5, 3, -6
    qtab = np.ones((8, 8), dtype=np.int64)

    out = bytearray(b"\xff\xd8")
    out += codecs._jpeg_dqt_segment(0, qtab)
    sof = bytes([8]) + _struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc2" + _struct.pack(">H", 2 + len(sof)) + sof
    out += codecs._jpeg_dht_segment(0, 0, codecs._JPEG_DC_LUMA)
    out += codecs._jpeg_dht_segment(1, 0, codecs._JPEG_AC_PROG)
    dc_codes = codecs._huffman_canonical(*codecs._JPEG_DC_LUMA)
    ac_codes = codecs._huffman_canonical(*codecs._JPEG_AC_PROG)

    def sos(ss, se, ah, al):
        body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        return b"\xff\xda" + _struct.pack(">H", 2 + len(body)) + body

    # scan 1: DC first, Al=1 — codes dc>>1 = -3 (diff from pred 0)
    out += sos(0, 0, 0, 1)
    bw = codecs._BitWriter()
    cat = codecs._jpeg_category(-3)  # 2
    code, length = dc_codes[cat]
    bw.write(code, length)
    bw.write(codecs._jpeg_magnitude_bits(-3, cat), cat)
    out += bw.flush()
    # scan 2: AC first 1..63 at Al=1 — shifted: zz1 -> 1, zz4 -> -3
    out += sos(1, 63, 0, 1)
    bw = codecs._BitWriter()
    code, length = ac_codes[(0 << 4) | 1]  # run 0, size 1 → value 1 at k=1
    bw.write(code, length)
    bw.write(codecs._jpeg_magnitude_bits(1, 1), 1)
    code, length = ac_codes[(2 << 4) | 2]  # run 2 (k=2,3), size 2 → -3 at k=4
    bw.write(code, length)
    bw.write(codecs._jpeg_magnitude_bits(-3, 2), 2)
    code, length = ac_codes[0x00]  # EOB
    bw.write(code, length)
    out += bw.flush()
    # scan 3: AC refine Ah=1, Al=0 — both coeffs are history (t>1):
    # block is all-EOB; EOB0 then the buffered correction bits 1 (for
    # 3) and 0 (for -6)
    out += sos(1, 63, 1, 0)
    bw = codecs._BitWriter()
    code, length = ac_codes[0x00]
    bw.write(code, length)
    bw.write(1, 1)  # 3 & 1
    bw.write(0, 1)  # 6 & 1
    out += bw.flush()
    # scan 4: DC refine Ah=1, Al=0 — bit0 of -5 (two's complement) = 1
    out += sos(0, 0, 1, 0)
    bw = codecs._BitWriter()
    bw.write(1, 1)
    out += bw.flush()
    out += b"\xff\xd9"

    got = codecs.decode_jpeg(bytes(out))
    # expected pixels from the exact reconstruction formula
    m = codecs._jpeg_dct_matrix()
    nat = np.zeros(64)
    nat[codecs._JPEG_ZIGZAG] = zz.astype(np.float64)
    block = m.T @ nat.reshape(8, 8) @ m
    expect = np.clip(np.round(block + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got, np.stack([expect] * 3, axis=2))


def test_jpeg_progressive_handwritten_420_subsampled_decodes():
    # Progressive twin of the baseline 4:2:0 fixture: 16x16, Y 2x2
    # (4 blocks, interleaved DC MCU geometry), Cb/Cr 1x1 (1 block
    # each, non-interleaved AC grids), flat gray 100. Scans: DC first
    # at Al=1, per-component all-zero AC bands via EOBn runs (EOB2
    # covering Y's 4 blocks — exercises eobrun > 1 over a subsampled
    # grid), DC refinement Ah=1->Al=0.
    import struct as st

    out = bytearray(b"\xff\xd8")
    out += codecs._jpeg_dqt_segment(0, np.ones((8, 8), dtype=np.int64))
    sof = bytes([8]) + st.pack(">HH", 16, 16) + bytes(
        [3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    out += b"\xff\xc2" + st.pack(">H", 2 + len(sof)) + sof
    out += codecs._jpeg_dht_segment(0, 0, codecs._JPEG_DC_LUMA)
    out += codecs._jpeg_dht_segment(1, 0, codecs._JPEG_AC_PROG)
    dc = codecs._huffman_canonical(*codecs._JPEG_DC_LUMA)
    ac = codecs._huffman_canonical(*codecs._JPEG_AC_PROG)

    def sos(comps, ss, se, ah, al):
        body = bytes([len(comps)])
        for c in comps:
            body += bytes([c, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + st.pack(">H", 2 + len(body)) + body

    # scan 1: interleaved DC first, Al=1. Y DC = 8*(100-128) = -224,
    # shifted -112; diffs: -112, 0, 0, 0; Cb/Cr 0.
    out += sos([1, 2, 3], 0, 0, 0, 1)
    bw = codecs._BitWriter()
    for diff in (-112, 0, 0, 0, 0, 0):
        cat = codecs._jpeg_category(diff)
        code, ln = dc[cat]
        bw.write(code, ln)
        if cat:
            bw.write(codecs._jpeg_magnitude_bits(diff, cat), cat)
    out += bw.flush()
    # scans 2-4: all-zero AC bands per component via EOBn
    for comp, eobrun in ((1, 4), (2, 1), (3, 1)):
        out += sos([comp], 1, 63, 0, 0)
        bw = codecs._BitWriter()
        n = eobrun.bit_length() - 1
        code, ln = ac[n << 4]
        bw.write(code, ln)
        if n:
            bw.write(eobrun & ((1 << n) - 1), n)
        out += bw.flush()
    # scan 5: DC refinement Ah=1 -> Al=0: bit0 of -224 is 0 (6 blocks)
    out += sos([1, 2, 3], 0, 0, 1, 0)
    bw = codecs._BitWriter()
    for _ in range(6):
        bw.write(0, 1)
    out += bw.flush()
    out += b"\xff\xd9"
    dec = codecs.decode_jpeg(bytes(out))
    assert dec.shape == (16, 16, 3) and (dec == 100).all()


def test_jpeg_progressive_optimized_tables():
    # Two-pass optimized per-scan Huffman tables (the real-writer shape,
    # with mid-stream DHT redefinition) must decode identically to both
    # the flat-table progressive stream and the baseline encoding — and
    # actually be smaller than the flat table.
    rng = np.random.default_rng(11)
    for shape, q in [((24, 24), 85), ((17, 23, 3), 75), ((32, 16, 3), 95)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=q))
        opt = codecs.encode_jpeg_progressive(img, quality=q)  # default optimized
        flat = codecs.encode_jpeg_progressive(img, quality=q, optimize_coding=False)
        assert np.array_equal(codecs.decode_jpeg(opt), base), (shape, q)
        assert np.array_equal(codecs.decode_jpeg(flat), base), (shape, q)
        assert len(opt) < len(flat), (shape, q, len(opt), len(flat))
        # the optimized stream redefines the AC table mid-stream: one
        # DHT per AC scan (2 first + 2 refine per component) plus the
        # upfront DC table(s)
        n_ac_scans = 4 if img.ndim == 2 else 12
        upfront_dc = 1 if img.ndim == 2 else 2
        assert opt.count(b"\xff\xc4") == n_ac_scans + upfront_dc


def test_optimal_huffman_spec_properties():
    # The length-limited canonical builder: Kraft-valid, <=16 bits,
    # covers every symbol exactly once, and survives skewed and
    # single-symbol frequency shapes.
    from data_pipeline_with_spark_spark.llm.codecs import (
        _huffman_canonical,
        _optimal_huffman_spec,
    )

    cases = [
        {0x00: 1},                                  # single symbol
        {0x00: 1000, 0x01: 1, 0x11: 1},             # heavy skew
        {i: i + 1 for i in range(0, 176)},          # many symbols
        {0x00: 1, 0x01: 2, 0x02: 4, 0x03: 8, 0x04: 16, 0x05: 32,
         0x06: 64, 0x07: 128, 0x08: 256, 0x09: 512, 0x0A: 1024,
         0x10: 2048, 0x20: 4096, 0x30: 8192, 0x40: 16384, 0x50: 32768,
         0x60: 65536, 0x70: 131072},                # fibonacci-ish: deep tree
    ]
    for freq in cases:
        bits, vals = _optimal_huffman_spec(freq)
        assert len(bits) == 16
        assert sum(bits) == len(vals) == len(freq)
        assert sorted(vals) == sorted(freq)
        assert sum(n * 2 ** (16 - (l + 1)) for l, n in enumerate(bits)) <= 2**16
        codes = _huffman_canonical(bits, vals)
        # prefix-free: canonical codes from a Kraft-valid histogram are
        # prefix-free by construction; spot-check uniqueness
        assert len({(c, n) for c, n in codes.values()}) == len(vals)
