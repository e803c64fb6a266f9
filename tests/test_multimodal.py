"""Multimodal plumbing tests: binary columns + Arrow-batched stub decode."""

import pytest

from gcp_datalake_pipeline_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image/fake", mm.make_fake_image(640, 480)),
        (2, "image/fake", mm.make_fake_image(1920, 1080, 4)),
        (3, "image/fake", None),
        (4, "application/octet-stream", b"\x00\x01garbage"),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(2).cache()


def test_image_metadata(spark, media):
    meta = {r["media_id"]: r for r in mm.image_metadata(media).collect()}
    assert meta[1]["width"] == 640 and meta[1]["height"] == 480
    assert meta[1]["channels"] == 3 and meta[1]["decode_ok"]
    assert meta[2]["width"] == 1920 and meta[2]["channels"] == 4
    assert meta[3]["decode_ok"] is False and meta[3]["n_bytes"] is None
    assert meta[4]["decode_ok"] is False and meta[4]["n_bytes"] == 9


def test_image_features_shape_and_determinism(spark, media):
    f1 = {r["media_id"]: r["features"] for r in mm.image_features(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in mm.image_features(media).collect()}
    assert f1 == f2
    assert len(f1[1]) == mm.FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in f1[1])
    assert f1[3] is None and f1[4] is None


def test_resize_images(spark, media):
    ok = media.filter("media_id in (1, 2, 3)")
    resized = {
        r["media_id"]: r["content"]
        for r in mm.resize_images(ok, max_dim=960).collect()
    }
    assert resized[1].startswith(b"IMG|640|480|3|")  # under limit: unchanged
    assert resized[2].startswith(b"IMG|960|540|4|")  # 1920x1080 -> 960x540
    assert resized[3] is None


def test_resize_images_mixed_corpus_survives(spark):
    """Real-format rows (JPEG magic bytes, with no codec installed) must
    pass through unchanged with decode_ok=false — never kill the job."""
    jpeg_bytes = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + bytes(32)
    rows = [
        (1, "image/fake", mm.make_fake_image(1920, 1080)),
        (2, "image/jpeg", jpeg_bytes),
        (3, "image/fake", None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.resize_images(media, 960).collect()}
    assert out[1]["decode_ok"] and out[1]["content"].startswith(b"IMG|960|540|")
    assert out[2]["decode_ok"] is False
    assert out[2]["content"] == jpeg_bytes  # passed through, not destroyed
    assert out[3]["decode_ok"] is False and out[3]["content"] is None


def _real_png(width: int, height: int, color_type: int = 2) -> bytes:
    """A real, spec-valid minimal PNG built with stdlib only: signature +
    IHDR + one zlib IDAT of zero scanlines + IEND."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    nch = {0: 1, 2: 3, 6: 4}[color_type]
    raw = (b"\x00" + bytes(width * nch)) * height
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _real_jpeg(width: int, height: int, components: int = 3) -> bytes:
    """A JPEG header stream with a spec-correct marker walk: SOI + APP0 +
    a DQT segment to exercise skipping + SOF0 carrying the dimensions."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + bytes(6)
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + bytes(65)
    sof_payload = struct.pack(">BHHB", 8, height, width, components) + bytes(
        3 * components
    )
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def test_real_png_jpeg_header_decode(spark):
    """PNG IHDR and JPEG SOF0/SOF2 dimensions are REAL (stdlib struct
    parsing) — no image library involved; decode_ok=true with actual
    width/height/channels. Truncated real formats stay decode_ok=false."""
    rows = [
        (1, "image/png", _real_png(320, 200, color_type=2)),
        (2, "image/png", _real_png(64, 48, color_type=6)),
        (3, "image/jpeg", _real_jpeg(800, 600, components=3)),
        (4, "image/jpeg", _real_jpeg(123, 45, components=1)),
        # progressive JPEG: SOF2 instead of SOF0
        (5, "image/jpeg", _real_jpeg(99, 77).replace(b"\xff\xc0", b"\xff\xc2")),
        (6, "image/png", _real_png(320, 200)[:20]),   # truncated IHDR
        (7, "image/jpeg", b"\xff\xd8\xff\xe0\x00\x10JFIF" + bytes(8)),  # no SOF
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in mm.image_metadata(media).collect()}
    assert (meta[1]["width"], meta[1]["height"], meta[1]["channels"]) == (320, 200, 3)
    assert meta[1]["decode_ok"]
    assert (meta[2]["width"], meta[2]["height"], meta[2]["channels"]) == (64, 48, 4)
    assert (meta[3]["width"], meta[3]["height"], meta[3]["channels"]) == (800, 600, 3)
    assert (meta[4]["width"], meta[4]["height"], meta[4]["channels"]) == (123, 45, 1)
    assert (meta[5]["width"], meta[5]["height"]) == (99, 77)
    assert meta[6]["decode_ok"] is False
    assert meta[7]["decode_ok"] is False


def test_real_png_resizes_dependency_free(spark):
    """r9: real PNGs resize through the stdlib codec pair — decoded,
    area-resampled, re-encoded as PNG — with no PIL installed. The
    output is itself a valid PNG with the scaled dimensions."""
    png = _real_png(2000, 1000)
    media = spark.createDataFrame([(1, "image/png", png)], mm.MEDIA_SCHEMA)
    (row,) = mm.resize_images(media, max_dim=960).collect()
    assert row["decode_ok"] is True
    arr = mm._decode_png_pixels(bytes(row["content"]))
    assert arr is not None and arr.shape == (480, 960, 3)


def test_frame_sample_plan(spark, media):
    plan = mm.frame_sample_plan(media.filter("media_id = 1"), every_n=10)
    frames = [r["frame_index"] for r in plan.collect()]
    assert frames == sorted(frames)
    assert all(f % 10 == 0 for f in frames)


def test_audio_metadata(spark):
    rows = [
        (10, "audio/fake", mm.make_fake_audio(16000, 48000)),
        (11, "audio/fake", mm.make_fake_audio(44100, 441000)),
        (12, "audio/fake", None),
        (13, "audio/fake", b"not audio"),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in mm.audio_metadata(media).collect()}
    assert meta[10]["sample_rate"] == 16000
    assert meta[10]["duration_s"] == 3.0
    assert meta[11]["duration_s"] == 10.0
    assert meta[12]["decode_ok"] is False
    assert meta[13]["decode_ok"] is False


def _real_gif(width: int, height: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + bytes(8)


def _real_bmp(width: int, height: int, bits: int = 24) -> bytes:
    import struct

    file_hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    info_hdr = struct.pack("<IiiHH", 40, width, height, 1, bits) + bytes(24)
    return file_hdr + info_hdr


def test_real_gif_bmp_header_decode(spark):
    """GIF screen descriptor and BMP info header parse with stdlib struct:
    little-endian dims, top-down (negative height) BMPs normalized,
    palette BMPs report 1 channel."""
    rows = [
        (1, "image/gif", _real_gif(640, 350)),
        (2, "image/bmp", _real_bmp(1024, 768, bits=24)),
        (3, "image/bmp", _real_bmp(16, -16, bits=32)),  # top-down
        (4, "image/bmp", _real_bmp(32, 8, bits=8)),     # palette
        (5, "image/gif", b"GIF89a" + bytes(2)),          # truncated
        (6, "image/bmp", b"BM" + bytes(10)),             # truncated
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in mm.image_metadata(media).collect()}
    assert (meta[1]["width"], meta[1]["height"], meta[1]["channels"]) == (640, 350, 3)
    assert meta[1]["decode_ok"]
    assert (meta[2]["width"], meta[2]["height"], meta[2]["channels"]) == (1024, 768, 3)
    assert (meta[3]["width"], meta[3]["height"], meta[3]["channels"]) == (16, 16, 4)
    assert (meta[4]["width"], meta[4]["height"], meta[4]["channels"]) == (32, 8, 1)
    assert meta[5]["decode_ok"] is False
    assert meta[6]["decode_ok"] is False


def _real_wav(sample_rate: int, n_samples: int, channels: int = 1, bits: int = 16) -> bytes:
    import struct

    block_align = channels * bits // 8
    data = bytes(n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _real_mp4(timescale: int, duration: int, version: int = 0) -> bytes:
    import struct

    if version:
        mvhd_body = b"\x01\x00\x00\x00" + struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        ) + bytes(80)
    else:
        mvhd_body = b"\x00\x00\x00\x00" + struct.pack(
            ">IIII", 0, 0, timescale, duration
        ) + bytes(80)
    mvhd = struct.pack(">I4s", 8 + len(mvhd_body), b"mvhd") + mvhd_body
    moov = struct.pack(">I4s", 8 + len(mvhd), b"moov") + mvhd
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom\x00\x00\x02\x00"
    return ftyp + moov


def test_real_wav_header_decode(spark):
    rows = [
        (1, "audio/wav", _real_wav(44100, 44100 * 2)),          # 2.0 s stereo-less
        (2, "audio/wav", _real_wav(16000, 8000, channels=2)),   # 0.5 s stereo
        (3, "audio/wav", b"RIFF" + bytes(8)),                   # truncated
        (4, "audio/x-fake", mm.make_fake_audio(22050, 11025)),  # stub path intact
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in mm.audio_metadata(media).collect()}
    assert (meta[1]["sample_rate"], meta[1]["n_samples"]) == (44100, 88200)
    assert meta[1]["duration_s"] == 2.0
    assert (meta[2]["sample_rate"], meta[2]["n_samples"]) == (16000, 8000)
    assert meta[2]["duration_s"] == 0.5
    assert meta[3]["decode_ok"] is False
    assert meta[4]["duration_s"] == 0.5 and meta[4]["decode_ok"]


def test_real_mp4_mvhd_decode(spark):
    rows = [
        (1, "video/mp4", _real_mp4(600, 9000)),               # 15 s, v0
        (2, "video/mp4", _real_mp4(90000, 90000 * 7, version=1)),  # 7 s, v1
        (3, "video/mp4", b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00"),  # no moov
        (4, "video/x-fake", mm.make_fake_video(240, fps=24)),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in mm.video_metadata(media).collect()}
    assert meta[1]["duration_s"] == 15.0 and meta[1]["decode_ok"]
    assert meta[2]["duration_s"] == 7.0
    assert meta[3]["decode_ok"] is False
    assert meta[4]["n_frames"] == 240 and meta[4]["duration_s"] == 10.0


# -- real pixel/sample decode (round 6): dependency-free BMP/WAV ------------


def _full_bmp(pixel_rows, bits=24, top_down=False) -> bytes:
    """Complete uncompressed BMP: pixel_rows is top-to-bottom, each row a
    list of (r,g,b[,a]) tuples (or ints for 8-bit). Rows padded to 4
    bytes, stored bottom-up unless top_down."""
    import struct

    h, w = len(pixel_rows), len(pixel_rows[0])
    row_bytes = ((w * bits + 31) // 32) * 4
    data = bytearray()
    for row in pixel_rows if top_down else pixel_rows[::-1]:
        rb = bytearray()
        for px in row:
            if bits == 8:
                rb.append(px)
            elif bits == 24:
                rb += bytes([px[2], px[1], px[0]])
            else:
                rb += bytes([px[2], px[1], px[0], px[3]])
        rb += b"\x00" * (row_bytes - len(rb))
        data += rb
    off = 14 + 40
    file_hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bits, 0,
        len(data), 2835, 2835, 0, 0,
    )
    return file_hdr + info + bytes(data)


def _full_wav(raw, sample_rate=8000, bits=16, channels=1) -> bytes:
    """Complete WAV PCM with actual sample words (raw ints)."""
    import struct

    fmt_char = {8: "B", 16: "<h", 32: "<i"}[bits]
    data = (
        bytes(raw)
        if bits == 8
        else b"".join(struct.pack(fmt_char, v) for v in raw)
    )
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_bmp_pixel_stats_real_decode(spark):
    """Uncompressed BMP pixel rows decode end-to-end through the Arrow
    batch: true mean intensity, padded rows handled, top-down and 32-bit
    variants, undecodable rows flagged not failed."""
    white_black = [[(255, 255, 255), (0, 0, 0), (255, 255, 255)],
                   [(0, 0, 0), (255, 255, 255), (0, 0, 0)]]  # 3x2, mean 127.5
    solid = [[(10, 20, 30, 40)] * 2] * 2  # 32-bit, mean (10+20+30+40)/4=25
    rows = [
        (1, "image/bmp", _full_bmp(white_black)),
        (2, "image/bmp", _full_bmp(solid, bits=32)),
        (3, "image/bmp", _full_bmp(white_black, top_down=True)),
        (4, "image/png", _real_png(4, 4)),  # valid all-black PNG (r7: real decode)
        (5, "image/bmp", None),
        (6, "image/jpeg", _real_jpeg(8, 8)),  # DCT: codec-gated
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(2)
    out = {r["media_id"]: r for r in mm.image_pixel_stats(media).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (3, 2, 3)
    assert out[1]["decode_ok"] and abs(out[1]["mean_pixel"] - 0.5) < 1e-9
    assert out[2]["channels"] == 4
    assert abs(out[2]["mean_pixel"] - 25.0 / 255.0) < 1e-9
    assert abs(out[3]["mean_pixel"] - 0.5) < 1e-9  # top-down same pixels
    assert out[4]["decode_ok"] and out[4]["mean_pixel"] == 0.0  # zlib path
    assert out[5]["decode_ok"] is False
    assert out[6]["decode_ok"] is False and out[6]["mean_pixel"] is None


def test_bmp_pixel_decode_channel_order_and_rows(spark):
    """The decoder must un-BGR and un-flip: a red-top/blue-bottom image
    comes back red-top in RGB order."""
    img = [[(255, 0, 0)], [(0, 0, 255)]]  # top red, bottom blue
    arr = mm._decode_bmp_pixels(_full_bmp(img))
    assert arr.shape == (2, 1, 3)
    assert list(arr[0, 0]) == [255, 0, 0]
    assert list(arr[1, 0]) == [0, 0, 255]


def test_wav_sample_stats_real_decode(spark):
    """WAV PCM frames decode end-to-end through the Arrow batch: true
    RMS/peak on normalized samples for 16-bit and 8-bit, non-PCM formats
    flagged."""
    import struct

    s16 = [16384, -16384, 16384, -16384]  # |0.5| each -> rms 0.5
    s8 = [128, 255, 128, 1]  # -> 0, 0.9921875, 0, -0.9921875
    nonpcm = _full_wav(s16)
    nonpcm = nonpcm.replace(
        struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1
    )  # fmt code 3 = IEEE float: not our PCM path
    rows = [
        (1, "audio/wav", _full_wav(s16)),
        (2, "audio/wav", _full_wav(s8, bits=8)),
        (3, "audio/wav", _full_wav(s16, channels=2)),
        (4, "audio/wav", nonpcm),
        (5, "audio/x-fake", mm.make_fake_audio(22050, 100)),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(2)
    out = {r["media_id"]: r for r in mm.audio_sample_stats(media).collect()}
    assert out[1]["decode_ok"] and out[1]["n_frames"] == 4
    assert abs(out[1]["rms_amplitude"] - 0.5) < 1e-12
    assert abs(out[1]["peak_amplitude"] - 0.5) < 1e-12
    expect8 = (2 * (127 / 128) ** 2 / 4) ** 0.5
    assert abs(out[2]["rms_amplitude"] - expect8) < 1e-12
    assert out[3]["n_channels"] == 2 and out[3]["n_frames"] == 2
    assert out[4]["decode_ok"] is False
    assert out[5]["decode_ok"] is False  # synthetic header has no samples


def test_bmp_8bit_palette_resolved(spark):
    """8-bit BMP pixels are palette INDICES: an all-index-0 image whose
    palette maps 0 -> white must read as mean 1.0, not 0.0; an inverted
    ramp palette must invert the stats."""
    import struct

    def bmp8(indices_rows, palette_rgb):
        h, w = len(indices_rows), len(indices_rows[0])
        row_bytes = ((w * 8 + 31) // 32) * 4
        pal = b"".join(
            bytes([b_, g, r, 0]) for (r, g, b_) in palette_rgb
        )
        data = bytearray()
        for row in indices_rows[::-1]:
            rb = bytearray(row) + b"\x00" * (row_bytes - w)
            data += rb
        off = 14 + 40 + len(pal)
        hdrs = (
            b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(data),
                2835, 2835, len(palette_rgb), 0,
            )
        )
        return hdrs + pal + bytes(data)

    white_pal = [(255, 255, 255)] + [(0, 0, 0)] * 255
    rows = [
        (1, "image/bmp", bmp8([[0, 0], [0, 0]], white_pal)),
        (2, "image/bmp", bmp8([[1, 1], [1, 1]], white_pal)),  # black
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.image_pixel_stats(media).collect()}
    assert out[1]["decode_ok"] and abs(out[1]["mean_pixel"] - 1.0) < 1e-9
    assert out[2]["decode_ok"] and out[2]["mean_pixel"] == 0.0
    assert out[1]["channels"] == 3  # palette resolved to RGB


def test_bmp_decode_roundtrip_property():
    """Hypothesis round-trip: encode random pixel grids at 24/32-bit and
    random top_down, decode, and require EXACT pixel equality (incl. row
    padding and BGR/vertical-flip handling) — no Spark needed, the
    decoder is a pure function."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 7),
        bits=st.sampled_from([24, 32]),
        top_down=st.booleans(),
        data=st.data(),
    )
    def check(w, h, bits, top_down, data):
        ch = bits // 8
        px = data.draw(
            st.lists(
                st.lists(
                    st.tuples(*[st.integers(0, 255)] * ch),
                    min_size=w, max_size=w,
                ),
                min_size=h, max_size=h,
            )
        )
        arr = mm._decode_bmp_pixels(_full_bmp(px, bits=bits, top_down=top_down))
        assert arr is not None and arr.shape == (h, w, ch)
        assert np.array_equal(arr, np.array(px, dtype=np.uint8))

    check()


def test_wav_decode_roundtrip_property():
    """Hypothesis round-trip: random PCM sample words at 8/16/32-bit,
    encode, decode, exact normalized-value equality."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(bits=st.sampled_from([8, 16, 32]), data=st.data())
    def check(bits, data):
        lo, hi = (0, 255) if bits == 8 else (-(2 ** (bits - 1)), 2 ** (bits - 1) - 1)
        raw = data.draw(st.lists(st.integers(lo, hi), min_size=1, max_size=40))
        out = mm._decode_wav_samples(_full_wav(raw, bits=bits))
        assert out is not None
        sr, ch, samples = out
        assert (sr, ch) == (8000, 1) and len(samples) == len(raw)
        if bits == 8:
            want = (np.array(raw, dtype=np.float64) - 128.0) / 128.0
        else:
            want = np.array(raw, dtype=np.float64) / float(2 ** (bits - 1))
        assert np.array_equal(samples, want)

    check()


def test_wav_short_fmt_chunk_rejected():
    """A fmt chunk whose own csize is under the 16-byte PCM header must
    decode to None, not read sample_rate/bits from the NEXT chunk's
    bytes (garbage stats with decode_ok=true)."""
    import struct

    good = _full_wav([1000, -1000])
    # shrink the declared fmt csize to 12: the 16 fmt payload bytes are
    # still present, but the header now claims fewer — parsing past the
    # declared size would be reading unowned bytes
    fmt_at = good.index(b"fmt ")
    bad = (
        good[: fmt_at + 4]
        + struct.pack("<I", 12)
        + good[fmt_at + 8 :]
    )
    assert mm._decode_wav_samples(good) is not None
    assert mm._decode_wav_samples(bad) is None


def _full_png(px, color_type=2, filters=None, palette=None) -> bytes:
    """Complete 8-bit PNG with actual pixels, encoding each scanline
    with a chosen filter (default None) — the inverse of the decoder,
    written independently from the spec."""
    import struct
    import zlib

    import numpy as np

    arr = np.array(px, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    flat = arr.reshape(h, w * ch).astype(np.int32)
    filters = filters if filters is not None else [0] * h
    prev = np.zeros(w * ch, dtype=np.int32)
    lines = b""
    for y in range(h):
        row, f = flat[y], filters[y]
        enc = row.copy()
        for x in range(len(row)):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                pred = 0
            enc[x] = (int(row[x]) - pred) % 256
        lines += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = row

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(
            b"PLTE", bytes(np.array(palette, dtype=np.uint8).ravel())
        )
    return out + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b"")


def test_png_pixel_stats_real_decode(spark):
    """8-bit PNGs decode end-to-end through the Arrow batch with true
    mean-pixel stats — every scanline filter exercised, RGB and RGBA,
    grayscale, and corrupt streams flagged not failed."""
    import numpy as np

    rgb = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
        [(200, 100, 0), (0, 200, 100), (100, 0, 200)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
        [(255, 255, 255), (0, 0, 0), (128, 128, 128)],
    ]
    rgba = [[(10, 20, 30, 255), (40, 50, 60, 128)],
            [(70, 80, 90, 0), (200, 210, 220, 64)]]
    gray = [[0, 255], [128, 64]]
    truncated = _full_png(rgb)[:-20]
    rows = [
        (1, "image/png", _full_png(rgb, filters=[0, 1, 2, 3, 4])),
        (2, "image/png", _full_png(rgba, color_type=6, filters=[4, 3])),
        (3, "image/png", _full_png(gray, color_type=0, filters=[1, 2])),
        (4, "image/png", truncated),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(2)
    out = {r["media_id"]: r for r in mm.image_pixel_stats(media).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (3, 5, 3)
    assert out[1]["decode_ok"]
    assert abs(
        out[1]["mean_pixel"] - np.array(rgb, dtype=np.float64).mean() / 255.0
    ) < 1e-12
    assert out[2]["channels"] == 4
    assert abs(
        out[2]["mean_pixel"] - np.array(rgba, dtype=np.float64).mean() / 255.0
    ) < 1e-12
    assert (out[3]["channels"], out[3]["decode_ok"]) == (1, True)
    assert abs(
        out[3]["mean_pixel"] - np.array(gray, dtype=np.float64).mean() / 255.0
    ) < 1e-12
    assert out[4]["decode_ok"] is False and out[4]["mean_pixel"] is None


def test_png_palette_resolved():
    """Color type 3 pixels are PLTE indices: the decoder must map them
    to RGB (raw indices would give wrong stats for any real palette)."""
    import numpy as np

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = [[1, 2], [3, 0]]
    arr = mm._decode_png_pixels(
        _full_png(idx, color_type=3, palette=palette, filters=[2, 1])
    )
    want = np.array(palette, dtype=np.uint8)[np.array(idx)]
    assert np.array_equal(arr, want)
    # out-of-range index = corrupt, not garbage stats
    assert (
        mm._decode_png_pixels(
            _full_png([[9]], color_type=3, palette=palette)
        )
        is None
    )


def test_png_decode_roundtrip_property():
    """Hypothesis round-trip: random pixels, sizes, channel counts, and
    per-row filter choices; encode then decode must be exact."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        ct=st.sampled_from([0, 2, 4, 6]),
        w=st.integers(1, 6),
        h=st.integers(1, 6),
        data=st.data(),
    )
    def check(ct, w, h, data):
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        px = data.draw(
            st.lists(
                st.lists(
                    st.tuples(*([st.integers(0, 255)] * ch)),
                    min_size=w, max_size=w,
                ),
                min_size=h, max_size=h,
            )
        )
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        arr = mm._decode_png_pixels(_full_png(px, color_type=ct, filters=filters))
        assert arr is not None and arr.shape == (h, w, ch)
        assert np.array_equal(
            arr, np.array(px, dtype=np.uint8).reshape(h, w, ch)
        )

    check()


def test_png_wavefront_tall_run_chunks():
    """Runs of Average/Paeth rows taller than the wavefront's 512-row
    chunk bound must chain the last reconstructed row between chunks —
    a 600-row all-Paeth image round-trips exactly."""
    import numpy as np

    from gcp_datalake_pipeline_spark.operators.multimodal import (
        _decode_png_pixels,
    )

    rng = np.random.default_rng(11)
    h, w, ch = 600, 5, 3
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8).astype(np.int16)
    stride = w * ch
    flat = img.reshape(h, stride)
    raw = bytearray()
    prev = np.zeros(stride, np.int16)
    for y in range(h):
        row = flat[y]
        a = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
        c = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        p = a + prev - c
        pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
        pred = np.where(
            (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c)
        )
        raw.append(4)
        raw.extend(((row - pred) & 0xFF).astype(np.uint8).tobytes())
        prev = row
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = _decode_png_pixels(png)
    assert got is not None
    assert (got.reshape(h, w, ch) == img.astype(np.uint8)).all()


# ---------------------------------------------------------------------------
# Baseline JPEG decoder tests (fixtures come from the package's own
# spec-valid encoder — zigzag order is pinned against T.81 below so the
# encode/decode pair cannot drift together)
# ---------------------------------------------------------------------------

_full_jpeg = mm._encode_jpeg_baseline


def _gradient_rgb(h, w):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    r = 255.0 * x / max(w - 1, 1)
    g = 255.0 * y / max(h - 1, 1)
    b = (r + g) / 2.0
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def test_jpeg_zigzag_matches_spec_prefix():
    """The generated zigzag order must equal T.81's table (prefix pinned
    by hand so the generator cannot drift in both encoder and decoder)."""
    zz = mm._jpeg_zigzag()
    assert zz[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert len(zz) == 64 and len(set(zz)) == 64
    assert zz[-1] == (7, 7)


def test_jpeg_baseline_decode_444_gray_and_subsampled():
    """Baseline JPEG decodes for real: 4:4:4 RGB, grayscale, 4:2:0 and
    4:2:2 chroma subsampling, dims NOT multiples of 8 (MCU padding must
    crop), quality-95 gradients reconstruct within a tight tolerance."""
    import numpy as np

    img = _gradient_rgb(37, 45)
    for sub, tol_max, tol_mean in (((1, 1), 20, 3.0), ((2, 2), 36, 4.5),
                                   ((2, 1), 36, 4.0)):
        data = _full_jpeg(img, quality=95, sub=sub)
        arr = mm._decode_jpeg_pixels(data)
        assert arr is not None and arr.shape == (37, 45, 3), sub
        diff = np.abs(arr.astype(np.int32) - img.astype(np.int32))
        assert diff.max() <= tol_max, (sub, diff.max())
        assert diff.mean() <= tol_mean, (sub, diff.mean())

    gray = np.clip(
        np.add.outer(np.arange(29) * 4.0, np.arange(33) * 3.0), 0, 255
    ).astype(np.uint8)
    arr = mm._decode_jpeg_pixels(_full_jpeg(gray, quality=95))
    assert arr is not None and arr.shape == (29, 33, 1)
    diff = np.abs(arr[:, :, 0].astype(np.int32) - gray.astype(np.int32))
    assert diff.max() <= 12 and diff.mean() <= 2.0


def test_jpeg_quality_100_near_lossless():
    """quality=100 collapses the quant tables to all-ones: the only loss
    is coefficient rounding — reconstruction within a few levels, and a
    noise image (worst case for DCT) still round-trips tightly."""
    import numpy as np

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    arr = mm._decode_jpeg_pixels(_full_jpeg(noise, quality=100))
    assert arr is not None
    assert np.abs(
        arr.astype(np.int32) - noise.astype(np.int32)
    ).max() <= 6

    gnoise = rng.integers(0, 256, (24, 16), dtype=np.uint8)
    arr = mm._decode_jpeg_pixels(_full_jpeg(gnoise, quality=100))
    assert np.abs(
        arr[:, :, 0].astype(np.int32) - gnoise.astype(np.int32)
    ).max() <= 2


def test_jpeg_restart_intervals_do_not_change_pixels():
    """DRI/RSTn: predictors reset and the bitstream re-aligns at every
    restart, but the quantized coefficients are identical — decoded
    pixels must be EXACTLY equal with and without restart markers."""
    import numpy as np

    img = _gradient_rgb(40, 24)
    plain = mm._decode_jpeg_pixels(_full_jpeg(img, quality=90))
    restarted = mm._decode_jpeg_pixels(
        _full_jpeg(img, quality=90, restart=2)
    )
    assert plain is not None and restarted is not None
    assert np.array_equal(plain, restarted)


def test_jpeg_codec_territory_returns_none():
    """Progressive (SOF2), truncated entropy data, and non-JPEG bytes
    all report not-decodable instead of raising or emitting garbage."""
    img = _gradient_rgb(16, 16)
    data = _full_jpeg(img, quality=90)
    assert mm._decode_jpeg_pixels(data) is not None

    progressive = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert mm._decode_jpeg_pixels(progressive) is None
    assert mm._decode_jpeg_pixels(data[: len(data) // 2]) is None
    assert mm._decode_jpeg_pixels(b"not a jpeg") is None
    assert mm._decode_jpeg_pixels(None) is None


def test_jpeg_pixel_stats_integration(spark):
    """image_pixel_stats decodes baseline JPEG dependency-free: true
    dims + mean within the compression tolerance, decode_ok=true."""
    import numpy as np

    img = _gradient_rgb(32, 48)
    media = spark.createDataFrame(
        [
            (1, "image/jpeg", _full_jpeg(img, quality=95, sub=(2, 2))),
            (2, "image/jpeg", b"\xff\xd8\xff\xe0corrupt"),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in mm.image_pixel_stats(media).collect()}
    assert out[1]["decode_ok"] is True
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (
        48, 32, 3,
    )
    assert abs(out[1]["mean_pixel"] - float(img.mean()) / 255.0) < 0.02
    assert out[2]["decode_ok"] is False and out[2]["mean_pixel"] is None


def test_resize_array_exact_box_filter():
    """The area resampler is an EXACT box filter: integer-factor
    downscales equal the block mean, arbitrary ratios preserve the
    global mean (weights sum to 1), upscaling never happens."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 32, 3), dtype=np.uint8)
    got = mm._resize_array(img, 16)  # 64x32 -> 16x8: factor 4 exact
    want = np.rint(
        img.astype(np.float64).reshape(16, 4, 8, 4, 3).mean(axis=(1, 3))
    ).astype(np.uint8)
    assert got.shape == (16, 8, 3)
    assert np.array_equal(got, want)

    odd = mm._resize_array(img, 13)  # non-integer ratio
    assert odd.shape == (13, 7, 3) or odd.shape == (13, 6, 3)
    assert abs(float(odd.mean()) - float(img.mean())) < 2.0

    same = mm._resize_array(img, 64)  # within bounds: identity object
    assert same is img


def test_resize_real_formats_round_trip(spark):
    """BMP, PNG, and baseline JPEG rows resize dependency-free and
    re-encode IN THEIR OWN FAMILY; pixel content survives within codec
    tolerance; within-bounds rows pass through byte-identical."""
    import numpy as np

    rng = np.random.default_rng(5)
    img = np.zeros((40, 64, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, 64, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.linspace(0, 255, 40, dtype=np.uint8)[:, None]
    img[:, :, 2] = 128

    bmp = mm._encode_bmp(img)
    png = mm._encode_png(img)
    jpg = mm._encode_jpeg_baseline(img, quality=95)
    small_png = mm._encode_png(img[:8, :8])
    rows = [
        (1, "image/bmp", bmp),
        (2, "image/png", png),
        (3, "image/jpeg", jpg),
        (4, "image/png", small_png),  # already within max_dim
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r for r in mm.resize_images(media, 32).collect()
    }
    assert all(out[i]["decode_ok"] for i in (1, 2, 3, 4))
    assert bytes(out[4]["content"]) == small_png  # untouched bytes

    want = mm._resize_array(img, 32)  # (20, 32, 3)
    got_bmp = mm._decode_bmp_pixels(bytes(out[1]["content"]))
    got_png = mm._decode_png_pixels(bytes(out[2]["content"]))
    got_jpg = mm._decode_jpeg_pixels(bytes(out[3]["content"]))
    assert bytes(out[1]["content"])[:2] == b"BM"  # family preserved
    assert bytes(out[2]["content"])[:4] == b"\x89PNG"[:4]
    assert bytes(out[3]["content"])[:2] == b"\xff\xd8"
    assert np.array_equal(got_bmp, want)  # lossless families: exact
    assert np.array_equal(got_png, want)
    assert got_jpg.shape == want.shape
    assert np.abs(
        got_jpg.astype(np.int32) - want.astype(np.int32)
    ).mean() <= 3.0

    # 8-bit palette BMP and RGBA PNG keep working through the same path
    pal_src = rng.integers(0, 256, (48, 40, 4), dtype=np.uint8)
    rgba_png = mm._encode_png(pal_src)
    (row,) = mm.resize_images(
        spark.createDataFrame(
            [(9, "image/png", rgba_png)], mm.MEDIA_SCHEMA
        ),
        24,
    ).collect()
    got = mm._decode_png_pixels(bytes(row["content"]))
    assert row["decode_ok"] and got.shape == (24, 20, 4)


# ---------------------------------------------------------------------------
# GIF first-frame pixel decode: spec-valid test encoder + decoder tests
# ---------------------------------------------------------------------------


def _lzw_encode_literals(indices, min_code):
    """Valid GIF LZW stream emitting only root codes — the encoder never
    uses dictionary entries, but must still GROW its code width (and
    CLEAR near table capacity) exactly when the decoder's table does."""
    clear = 1 << min_code
    end = clear + 1
    codes = []
    cs = min_code + 1
    size = clear + 2
    codes.append((clear, cs))
    first = True
    for v in indices:
        codes.append((int(v), cs))
        if first:
            first = False
        else:
            size += 1
            if size == (1 << cs) and cs < 12:
                cs += 1
            if size >= 4094:
                codes.append((clear, cs))
                cs = min_code + 1
                size = clear + 2
                first = True
    codes.append((end, cs))
    acc = bits = 0
    out = bytearray()
    for c, wd in codes:
        acc |= c << bits
        bits += wd
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _full_gif(indices, palette, interlace=False):
    """A real, spec-valid GIF89a with a global color table, a graphic
    control extension (exercises block skipping), one image frame."""
    import struct

    import numpy as np

    indices = np.asarray(indices)
    h, w = indices.shape
    n = len(palette)
    k = max(0, (n - 1).bit_length() - 1)
    assert n == 2 << k, "palette size must be a power of two >= 2"
    min_code = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | k, 0, 0])  # GCT present, size 2<<k
    out += bytes(int(x) for rgb in palette for x in rgb)
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, no transparency
    fpacked = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([fpacked])
    rows = indices
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = indices[order]
    data = _lzw_encode_literals(rows.reshape(-1), min_code)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_pixel_decode_round_trips():
    """GIF LZW first-frame decode: palette round-trip exact, including
    code-width growth across a table-capacity CLEAR (4k+ pixels),
    interlaced row order, and a 2-color palette at the minimum code
    size."""
    import numpy as np

    rng = np.random.default_rng(17)
    pal8 = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (25, 17), dtype=np.uint8)
    got = mm._decode_gif_pixels(_full_gif(idx, pal8))
    assert got is not None and got.shape == (25, 17, 3)
    assert np.array_equal(got, pal8[idx])

    big = rng.integers(0, 8, (80, 70), dtype=np.uint8)  # 5600 px: CLEAR
    got = mm._decode_gif_pixels(_full_gif(big, pal8))
    assert got is not None and np.array_equal(got, pal8[big])

    inter = mm._decode_gif_pixels(_full_gif(idx, pal8, interlace=True))
    assert np.array_equal(inter, pal8[idx])

    pal2 = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    bw = rng.integers(0, 2, (9, 13), dtype=np.uint8)
    got = mm._decode_gif_pixels(_full_gif(bw, pal2))
    assert np.array_equal(got, pal2[bw])


def test_gif_codec_territory_returns_none():
    import numpy as np

    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (12, 12), dtype=np.uint8)
    data = _full_gif(idx, pal)
    assert mm._decode_gif_pixels(data) is not None
    assert mm._decode_gif_pixels(data[: len(data) // 2]) is None
    assert mm._decode_gif_pixels(b"GIF89a\x00") is None
    assert mm._decode_gif_pixels(b"not a gif at all") is None
    assert mm._decode_gif_pixels(None) is None


def test_gif_pixel_stats_integration(spark):
    """image_pixel_stats decodes GIF dependency-free: true dims and the
    palette-resolved mean."""
    import numpy as np

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (20, 30), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image/gif", _full_gif(idx, pal))], mm.MEDIA_SCHEMA
    )
    (row,) = mm.image_pixel_stats(media).collect()
    assert row["decode_ok"] is True
    assert (row["width"], row["height"], row["channels"]) == (30, 20, 3)
    assert abs(
        row["mean_pixel"] - float(pal[idx].mean()) / 255.0
    ) < 1e-9


def test_resample_audio_wav_dependency_free(spark):
    """WAV rows resample to the target rate with no audio library:
    doubled rate doubles the frame count (endpoint-exact linear
    interpolation — a ramp resamples EXACTLY up to 16-bit
    quantization), stereo interleave survives, same-rate rows pass
    through byte-identical, garbage passes through flagged."""
    import numpy as np

    ramp = np.linspace(-0.5, 0.5, 101)  # piecewise-linear: interp-exact
    t = np.arange(800) / 8000.0
    sine = 0.4 * np.sin(2 * np.pi * 220.0 * t)
    stereo = np.stack([sine, -sine], axis=1).reshape(-1)
    rows = [
        (1, "audio/wav", _full_wav(
            np.rint(ramp * 32767).astype(int).tolist(), 8000, 16, 1)),
        (2, "audio/wav", _full_wav(
            np.rint(stereo * 32767).astype(int).tolist(), 8000, 16, 2)),
        (3, "audio/wav", _full_wav(
            np.rint(sine * 32767).astype(int).tolist(), 16000, 16, 1)),
        (4, "audio/mp3", b"\xff\xfbgarbage-not-pcm"),
        (5, "audio/wav", None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in mm.resample_audio(media, 16000).collect()
    }

    # ramp 8k -> 16k: frame count doubles, values linear-interp exact
    d = mm._decode_wav_samples(bytes(out[1]["content"]))
    assert out[1]["decode_ok"] and d is not None
    sr, ch, s = d
    assert (sr, ch) == (16000, 1) and s.size == 202
    want = np.interp(
        np.linspace(0, 100, 202), np.arange(101),
        np.rint(ramp * 32767) / 32768.0,
    )
    assert np.abs(s - want).max() <= 1.5 / 32768.0

    # stereo: channels stay separate and anti-phased
    d2 = mm._decode_wav_samples(bytes(out[2]["content"]))
    sr2, ch2, s2 = d2
    assert (sr2, ch2) == (16000, 2)
    fr = s2.reshape(-1, 2)
    assert fr.shape[0] == 1600
    assert np.abs(fr[:, 0] + fr[:, 1]).max() <= 2.5 / 32768.0
    # RMS survives resampling of a band-limited signal
    assert abs(
        float(np.sqrt((fr[:, 0] ** 2).mean()))
        - float(np.sqrt((sine**2).mean()))
    ) < 0.01

    # already at target: byte-identical passthrough
    assert out[3]["decode_ok"] is True
    assert bytes(out[3]["content"]) == rows[2][2]

    # compressed/garbage/NULL: flagged, untouched
    assert out[4]["decode_ok"] is False
    assert bytes(out[4]["content"]) == rows[3][2]
    assert out[5]["decode_ok"] is False and out[5]["content"] is None


def test_encode_wav_round_trip_8_and_32_bit_sources():
    """8-bit and 32-bit PCM inputs resample through float and come back
    16-bit (the documented common denominator)."""
    import numpy as np

    raw8 = bytes(range(0, 200, 2))  # unsigned 8-bit
    wav8 = _full_wav(raw8, 8000, 8, 1)
    sr, ch, s = mm._decode_wav_samples(wav8)
    out = mm._encode_wav(s, 8000, 1)
    sr2, ch2, s2 = mm._decode_wav_samples(out)
    assert (sr2, ch2) == (8000, 1)
    assert np.abs(s2 - s).max() <= 1.0 / 256.0  # 8->16 bit requantize
