"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

METADATA decode is real, stdlib-``struct``-only, for the common
containers: PNG IHDR / JPEG SOF / GIF screen descriptor / BMP info
header (images), WAV RIFF chunks (audio), MP4/MOV mvhd (video duration).

FULL decode is real, dependency-free, for the formats a careful stdlib+
numpy implementation can cover: uncompressed BMP (BI_RGB, 8/24/32-bit)
pixel rows, WAV PCM sample frames, non-interlaced 8-bit PNG (zlib +
all five scanline filters, wavefront-vectorized), BASELINE JPEG
(SOF0/SOF1 Huffman, grayscale + YCbCr with integer subsampling,
restart intervals — :func:`_decode_jpeg_pixels`), and GIF87a/89a
first frames (LZW + palettes + interlace — :func:`_decode_gif_pixels`) —
:func:`image_pixel_stats` / :func:`audio_sample_stats` compute true
mean-pixel / RMS-amplitude from the actual bytes. What genuinely needs
a codec (progressive/arithmetic JPEG, MP3/AAC samples, video frames)
stays behind the import-gated PIL / soundfile / ffmpeg hooks (absent
in this environment); formats without a parser use the deterministic
synthetic header so the Spark-side plumbing — schema, partitioning,
mapInPandas batch shape, metadata propagation — stays real and tested
end-to-end.

Synthetic binary layout (make_fake_image/make_fake_audio/make_fake_video):
  image: b"IMG|<width>|<height>|<channels>|" + payload bytes
  audio: b"AUD|<sample_rate>|<n_samples>|" + payload bytes
  video: b"VID|<n_frames>|<fps>|" + payload bytes
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)

FEATURE_DIM = 8

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def make_fake_image(width: int, height: int, channels: int = 3) -> bytes:
    payload = bytes((width * height + i) % 251 for i in range(32))
    return f"IMG|{width}|{height}|{channels}|".encode() + payload


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def make_fake_audio(sample_rate: int, n_samples: int) -> bytes:
    payload = bytes((n_samples + i) % 251 for i in range(16))
    return f"AUD|{sample_rate}|{n_samples}|".encode() + payload


def _parse_wav_header(content: bytes):
    """Real WAV metadata from the RIFF chunk stream — stdlib struct only.
    RIFF(4) + size(4) + WAVE(4), then chunks of [id(4) + size(4)]: the
    ``fmt `` chunk carries channels/sample_rate/block_align, the ``data``
    chunk's size / block_align is the sample-frame count."""
    import struct

    if content is None or len(content) < 36:
        return None
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    i, n = 12, len(content)
    sample_rate = block_align = data_size = None
    while i + 8 <= n:
        cid = content[i : i + 4]
        csize = struct.unpack("<I", content[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            _fmt, _ch, sample_rate = struct.unpack(
                "<HHI", content[i + 8 : i + 16]
            )
            block_align = struct.unpack("<H", content[i + 20 : i + 22])[0]
        elif cid == b"data":
            data_size = csize
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if not sample_rate or not block_align or data_size is None:
        return None
    return sample_rate, data_size // block_align


def audio_metadata(media: DataFrame) -> DataFrame:
    """Audio metadata: the synthetic AUD header (full-decode stand-in),
    else REAL WAV/RIFF parsing via stdlib struct (sample rate + frame
    count from the fmt/data chunks — no audio library). Same
    Arrow-batched plumbing as image_metadata; sample ACCESS (resampling,
    features) remains behind the soundfile/ffmpeg hooks."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for b in pdf["content"]:
                if b is not None and b.startswith(b"AUD|"):
                    try:
                        _, sr, n, _rest = b.split(b"|", 3)
                        out.append((int(sr), int(n)))
                        continue
                    except (ValueError, IndexError):
                        out.append(None)
                        continue
                out.append(_parse_wav_header(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [d[0] if d else None for d in out],
                    "n_samples": [d[1] if d else None for d in out],
                    "duration_s": [
                        d[1] / d[0] if d and d[0] else None for d in out
                    ],
                    "decode_ok": [d is not None for d in out],
                }
            )

    return media.mapInPandas(batches, AUDIO_META_SCHEMA)


def _parse_fake_header(content: bytes):
    """Synthetic IMG| header (the full-decode stand-in for formats beyond
    the two real header parsers below)."""
    if content is None or not content.startswith(b"IMG|"):
        return None
    try:
        _, w, h, c, _rest = content.split(b"|", 4)
        return int(w), int(h), int(c)
    except (ValueError, IndexError):
        return None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (palette indexes as 1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png_header(content: bytes):
    """Real PNG dimensions from the IHDR chunk — stdlib struct only, no
    image library. The IHDR is REQUIRED to be the first chunk (PNG spec
    §5.6 / 11.2.2): signature(8) + length(4) + b"IHDR" + width(4) +
    height(4) + bit_depth(1) + color_type(1)."""
    import struct

    if content is None or len(content) < 26:
        return None
    if content[:8] != _PNG_SIG or content[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", content[16:24])
    channels = _PNG_CHANNELS.get(content[25])
    if channels is None or w == 0 or h == 0:
        return None
    return w, h, channels


def _parse_jpeg_header(content: bytes):
    """Real JPEG dimensions from the first SOF0/SOF1/SOF2 frame marker —
    stdlib struct only. Walks the marker stream from SOI: each non-SOF
    segment is skipped by its big-endian length; SOFn carries
    precision(1) + height(2) + width(2) + n_components(1)."""
    import struct

    if content is None or len(content) < 4 or content[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            return None
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte padding
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # standalone
            i += 2
            continue
        seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            if seg_len < 8 or i + 10 > n:
                return None
            h, w = struct.unpack(">HH", content[i + 5 : i + 9])
            c = content[i + 9]
            if w == 0 or h == 0 or c == 0:
                return None
            return w, h, c
        if seg_len < 2:
            return None
        i += 2 + seg_len
    return None


def _parse_gif_header(content: bytes):
    """Real GIF dimensions from the logical screen descriptor — signature
    GIF87a/GIF89a then width(2) + height(2), little-endian (GIF89a spec
    §18). Channels reported as 3 (palette RGB)."""
    import struct

    if content is None or len(content) < 10:
        return None
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", content[6:10])
    if w == 0 or h == 0:
        return None
    return w, h, 3


def _parse_bmp_header(content: bytes):
    """Real BMP dimensions from the BITMAPINFOHEADER: b"BM" file header
    (14 bytes) then header size(4) + width(4, signed) + height(4, signed
    — negative means top-down). Channels from bit count (<=8 palette -> 1,
    24 -> 3, 32 -> 4)."""
    import struct

    if content is None or len(content) < 30 or content[:2] != b"BM":
        return None
    hdr_size = struct.unpack("<I", content[14:18])[0]
    if hdr_size < 40:  # BITMAPCOREHEADER etc. — not emitted by fixtures
        return None
    w, h = struct.unpack("<ii", content[18:26])
    bits = struct.unpack("<H", content[28:30])[0]
    w, h = abs(w), abs(h)
    if w == 0 or h == 0:
        return None
    channels = 1 if bits <= 8 else bits // 8
    return w, h, channels


def _decode_bmp_pixels(content: bytes):
    """REAL pixel decode for uncompressed BMP (BI_RGB, 8/24/32-bit) —
    stdlib struct + numpy, no image library. Rows are 4-byte aligned and
    bottom-up unless height is negative (top-down); 24/32-bit samples are
    stored BGR(A) and reordered to RGB(A). 8-bit pixels are PALETTE
    INDICES, not intensities: they are mapped through the mandatory
    BGRA color table to an (h, w, 3) RGB array (raw indices would give
    wrong statistics for any non-identity palette). Returns an
    (h, w, channels) uint8 array, or None for anything that needs a
    codec (compressed BMP, other bit depths, truncated bytes/palette)."""
    import struct

    import numpy as np

    if content is None or len(content) < 54 or content[:2] != b"BM":
        return None
    data_off = struct.unpack("<I", content[10:14])[0]
    hdr_size = struct.unpack("<I", content[14:18])[0]
    if hdr_size < 40:
        return None
    w, h = struct.unpack("<ii", content[18:26])
    bits = struct.unpack("<H", content[28:30])[0]
    comp = struct.unpack("<I", content[30:34])[0]
    if comp != 0 or bits not in (8, 24, 32):
        return None
    top_down = h < 0
    w, h = abs(w), abs(h)
    if w == 0 or h == 0:
        return None
    ch = 1 if bits == 8 else bits // 8
    row_bytes = ((w * bits + 31) // 32) * 4
    if len(content) < data_off + row_bytes * h:
        return None
    palette = None
    if bits == 8:
        n_colors = struct.unpack("<I", content[46:50])[0] or 256
        pal_off = 14 + hdr_size
        if pal_off + n_colors * 4 > min(len(content), data_off):
            return None  # palette truncated/overlaps data: codec territory
        quads = np.frombuffer(
            content, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)
        palette = quads[:, [2, 1, 0]]  # BGRA quads -> RGB
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    arr = rows[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        arr = arr[::-1]
    if palette is not None:
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            return None  # index out of palette range: corrupt
        arr = palette[idx]
    elif ch >= 3:  # BGR(A) -> RGB(A)
        arr = arr[:, :, [2, 1, 0, 3][:ch]]
    return arr


def _gif_lzw_decode(min_code: int, data: bytes, npix: int):
    """GIF LZW decompression (LSB-first bit packing, dynamic code width
    3..12, CLEAR/END codes, deferred-clear tolerated). Returns the pixel
    index list, or None on a corrupt stream."""
    clear = 1 << min_code
    end = clear + 1
    base = [(i,) for i in range(clear)] + [None, None]
    table = list(base)
    cs = min_code + 1
    acc = bits = 0
    out: list[int] = []
    prev = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= cs:
            code = acc & ((1 << cs) - 1)
            acc >>= cs
            bits -= cs
            if code == clear:
                table = list(base)
                cs = min_code + 1
                prev = None
                continue
            if code == end:
                return out[:npix] if len(out) >= npix else None
            if prev is None:
                if code >= len(table) or table[code] is None:
                    return None
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + (entry[0],))
            elif code == len(table) and len(table) < 4096:
                entry = prev + (prev[0],)
                table.append(entry)
            else:
                return None
            out.extend(entry)
            if len(table) == (1 << cs) and cs < 12:
                cs += 1
            prev = entry
            if len(out) >= npix:
                return out[:npix]
    return None  # ran out of data before END/npix


def _decode_gif_pixels(content: bytes):
    """REAL pixel decode for GIF87a/89a (FIRST frame) — stdlib + numpy,
    no image library: logical screen descriptor, global/local color
    tables, extension-block skipping, LZW decompression
    (:func:`_gif_lzw_decode`), and interlace reordering. Returns the
    first frame as an (h, w, 3) RGB uint8 array (frame's own dims;
    transparency is not applied — the stat is over stored colors), or
    None for corrupt/truncated streams."""
    import struct

    import numpy as np

    if content is None or len(content) < 13:
        return None
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = content[10]
    gct = None
    i = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if i + 3 * n > len(content):
            return None
        gct = np.frombuffer(
            content, dtype=np.uint8, count=3 * n, offset=i
        ).reshape(n, 3)
        i += 3 * n
    try:
        while i < len(content):
            b = content[i]
            if b == 0x3B:  # trailer before any image
                return None
            if b == 0x21:  # extension: label + sub-blocks
                i += 2
                while content[i] != 0:
                    i += 1 + content[i]
                i += 1
                continue
            if b != 0x2C:
                return None
            _left, _top, w, h = struct.unpack("<HHHH", content[i + 1 : i + 9])
            fpacked = content[i + 9]
            i += 10
            pal = gct
            if fpacked & 0x80:  # local color table wins
                n = 2 << (fpacked & 0x07)
                pal = np.frombuffer(
                    content, dtype=np.uint8, count=3 * n, offset=i
                ).reshape(n, 3)
                i += 3 * n
            if pal is None or w == 0 or h == 0:
                return None
            min_code = content[i]
            i += 1
            if not (2 <= min_code <= 8):
                return None
            lzw = bytearray()
            while content[i] != 0:
                sz = content[i]
                lzw += content[i + 1 : i + 1 + sz]
                i += 1 + sz
            idx = _gif_lzw_decode(min_code, bytes(lzw), w * h)
            if idx is None:
                return None
            arr = np.array(idx, dtype=np.uint16).reshape(h, w)
            if int(arr.max(initial=0)) >= len(pal):
                return None
            if fpacked & 0x40:  # interlaced: 4-pass row order
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                de = np.empty_like(arr)
                de[order] = arr
                arr = de
            return pal[arr]
    except (IndexError, struct.error):
        return None
    return None


def _png_wavefront(block, ftypes, prev, ch):
    """Vectorized reconstruction of a run of Average/Paeth-filtered PNG
    rows. Cell (y, x) depends on a=(y, x-ch), b=(y-1, x), c=(y-1, x-ch)
    only, so every anti-diagonal ``s = x + y*ch`` is dependency-free:
    instead of O(rows*stride) per-pixel Python iterations, the run is
    solved in ``stride + (rows-1)*ch`` numpy steps, each reconstructing
    one cell per row of the run via fancy indexing (the r7 per-pixel
    loop measured ~40x slower on a Paeth-heavy image — see PLANS.md).
    ``block``: (R, stride) int16 raw filtered bytes; ``ftypes``: (R,)
    filter codes (3=Average, 4=Paeth); ``prev``: (stride,) int16, the
    reconstructed row above the run (zeros for the first image row).
    Returns (R, stride) uint8."""
    import numpy as np

    R, stride = block.shape
    # Bound the skew buffer: very tall runs chunk into sub-blocks, the
    # last reconstructed row chaining between them.
    max_rows = 512
    if R > max_rows:
        out = np.empty((R, stride), dtype=np.uint8)
        p = prev
        for j in range(0, R, max_rows):
            out[j : j + max_rows] = _png_wavefront(
                block[j : j + max_rows], ftypes[j : j + max_rows], p, ch
            )
            p = out[min(j + max_rows, R) - 1].astype(np.int16)
        return out
    # SKEWED buffer: cell (r, x) — r=0 is prev, r=1..R the run rows —
    # lives at column x + r + pad, so every anti-diagonal becomes ONE
    # column and each wavefront step is plain contiguous column slicing
    # (no fancy indexing). Reads that fall left of x=0 land on
    # never-written zero columns — exactly the spec's "no left
    # neighbor" value.
    pad = ch + 1
    width = stride + R + pad + 1
    S = np.zeros((R + 1, width), dtype=np.int16, order="F")
    X = np.zeros((R + 1, width), dtype=np.int16, order="F")
    S[0, pad : pad + stride] = prev
    for j in range(R):
        X[j + 1, pad + j + 1 : pad + j + 1 + stride] = block[j]
    pae = ftypes == 4
    for s in range(pad + 1, pad + stride + R):
        r_lo = max(1, s - pad - stride + 1)
        r_hi = min(R, s - pad)
        a = S[r_lo : r_hi + 1, s - ch]
        b = S[r_lo - 1 : r_hi, s - 1]
        c = S[r_lo - 1 : r_hi, s - 1 - ch]
        p = a + b - c
        pa = np.abs(p - a)
        pb = np.abs(p - b)
        pc = np.abs(p - c)
        paeth = np.where(
            (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
        )
        avg = (a + b) >> 1
        pred = np.where(pae[r_lo - 1 : r_hi], paeth, avg)
        S[r_lo : r_hi + 1, s] = (X[r_lo : r_hi + 1, s] + pred) & 0xFF
    # un-skew: row r's cells live at cols [r+pad, r+pad+stride)
    out = np.empty((R, stride), dtype=np.uint8)
    for j in range(R):
        out[j] = S[j + 1, pad + j + 1 : pad + j + 1 + stride]
    return out


def _decode_png_pixels(content: bytes):
    """REAL pixel decode for non-interlaced 8-bit PNG — stdlib zlib +
    struct + numpy, no image library. IDAT is DEFLATE-compressed
    scanlines, each prefixed by a filter byte; all five filters
    (None/Sub/Up/Average/Paeth) are reconstructed per the spec. Color
    types: 0 grayscale, 2 RGB, 4 gray+alpha, 6 RGBA, and 3 palette
    (indices resolved through PLTE to RGB — raw indices would give wrong
    statistics for any non-identity palette). Returns an
    (h, w, channels) uint8 array, or None for anything that needs a real
    codec (16-bit, interlaced, truncated/corrupt streams)."""
    import struct
    import zlib

    import numpy as np

    sig = b"\x89PNG\r\n\x1a\n"
    if content is None or len(content) < 33 or not content.startswith(sig):
        return None
    i, n = 8, len(content)
    ihdr = plte = None
    idat = []
    while i + 8 <= n:
        clen = struct.unpack(">I", content[i : i + 4])[0]
        ctag = content[i + 4 : i + 8]
        data = content[i + 8 : i + 8 + clen]
        if len(data) < clen:
            return None  # truncated chunk
        if ctag == b"IHDR":
            ihdr = data
        elif ctag == b"PLTE":
            plte = data
        elif ctag == b"IDAT":
            idat.append(data)
        elif ctag == b"IEND":
            break
        i += 12 + clen  # length + tag + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if ch is None or depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        return None
    if w == 0 or h == 0:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = buf[:, 0].astype(np.int16)
    if int(ftypes.max(initial=0)) > 4:
        return None  # unknown filter: corrupt
    data = buf[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    y = 0
    # Row reconstruction, fully numpy-vectorized (no per-pixel Python):
    # None/Up are whole-row ops, Sub is a per-channel cumulative sum
    # mod 256, and Average/Paeth runs — whose left-neighbor dependency
    # makes rows sequential in x — are solved as an anti-diagonal
    # WAVEFRONT across the run (see _png_wavefront), turning O(h*w*ch)
    # Python-loop iterations into O(w*ch + h*ch) numpy vector steps.
    while y < h:
        f = int(ftypes[y])
        if f >= 3:  # Average/Paeth run -> wavefront
            y1 = y
            while y1 < h and ftypes[y1] >= 3:
                y1 += 1
            block = _png_wavefront(
                data[y:y1].astype(np.int16), ftypes[y:y1], prev, ch
            )
            out[y:y1] = block
            prev = block[-1].astype(np.int16)
            y = y1
            continue
        row = data[y].astype(np.int16)
        if f == 0:  # None
            r = row
        elif f == 2:  # Up (addition wraps mod 256 per spec)
            r = (row + prev) & 0xFF
        else:  # Sub: recon[x] = raw[x] + recon[x-ch] == per-lane cumsum
            r = (
                row.reshape(-1, ch).astype(np.int64).cumsum(axis=0) & 0xFF
            ).reshape(-1).astype(np.int16)
        out[y] = r.astype(np.uint8)
        prev = r
        y += 1
    arr = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None or len(plte) % 3 or len(plte) == 0:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            return None  # index out of palette range: corrupt
        arr = pal[idx]
    return arr


def _jpeg_zigzag():
    """The spec's 64-entry zigzag scan order as (row, col) pairs,
    GENERATED (diagonal walk) rather than transcribed — the pytest pins
    the first entries against the T.81 table to guard the generator."""
    idx = []
    for s in range(15):
        rng = range(s + 1) if s < 8 else range(s - 7, 8)
        diag = [(i, s - i) for i in rng]
        if s % 2 == 0:
            diag.reverse()
        idx.extend(diag)
    return idx


def _jpeg_dct_matrix():
    """The orthonormal 8-point DCT-II basis M (M[u, x] =
    c(u)/2 * cos((2x+1)u*pi/16)): forward F = M f M^T, inverse
    f = M^T F M — one einsum over all blocks, no per-pixel Python."""
    import numpy as np

    x = np.arange(8)
    M = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    M[0] /= np.sqrt(2.0)
    return M


class _JpegBits:
    """MSB-first bit reader over one entropy-coded segment (byte
    stuffing already removed). Exhaustion raises — the caller treats a
    truncated stream as not-decodable."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise EOFError
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huff_decode(bits: _JpegBits, table) -> int:
    """Canonical Huffman decode (T.81 F.2.2.3): per-length mincode/
    maxcode/valptr walk, one bit at a time."""
    mincode, maxcode, valptr, huffval = table
    code = bits.bit()
    ln = 1
    while ln <= 16:
        if maxcode[ln] >= 0 and code <= maxcode[ln]:
            return huffval[valptr[ln] + code - mincode[ln]]
        code = (code << 1) | bits.bit()
        ln += 1
    raise ValueError("invalid Huffman code")


def _jpeg_build_huff(counts, symbols):
    """(mincode, maxcode, valptr, huffval) from a DHT's BITS/HUFFVAL —
    the canonical code assignment of T.81 Annex C."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for ln in range(1, 17):
        if counts[ln - 1]:
            valptr[ln] = k
            mincode[ln] = code
            code += counts[ln - 1]
            k += counts[ln - 1]
            maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(symbols)


def _jpeg_extend(v: int, length: int) -> int:
    """DC/AC magnitude-category decode (T.81 F.2.2.1)."""
    if length == 0:
        return 0
    if v < (1 << (length - 1)):
        return v - (1 << length) + 1
    return v


def _decode_jpeg_pixels(content: bytes):
    """REAL pixel decode for BASELINE JPEG (SOF0/SOF1, 8-bit, Huffman) —
    stdlib struct + numpy, no image library (the PNG precedent,
    VERDICT r8 #6). Supports 1-component grayscale and 3-component
    JFIF YCbCr with any integer subsampling (4:4:4, 4:2:2, 4:2:0, ...),
    restart intervals, and multi-table DQT/DHT segments. Entropy
    decoding is necessarily bit-serial Python (Huffman), but
    dequantization, the IDCT (one einsum over ALL blocks against the
    orthonormal DCT basis), level shift, upsampling, and the YCbCr->RGB
    transform are whole-array numpy. Returns an (h, w, channels) uint8
    array, or None for anything that needs a real codec (progressive
    SOF2, arithmetic coding, 12-bit, truncated/corrupt streams)."""
    import struct

    import numpy as np

    if content is None or len(content) < 4 or content[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    frame = None
    restart_interval = 0
    scan = None
    i, n = 2, len(content)
    try:
        while i + 4 <= n:
            if content[i] != 0xFF:
                return None
            marker = content[i + 1]
            if marker == 0xD9:  # EOI before SOS
                return None
            seglen = struct.unpack(">H", content[i + 2 : i + 4])[0]
            seg = content[i + 4 : i + 2 + seglen]
            if len(seg) != seglen - 2:
                return None
            if marker == 0xDB:  # DQT (possibly several tables)
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 0x0F
                    j += 1
                    if pq == 0:
                        qt[tq] = np.frombuffer(
                            seg[j : j + 64], dtype=np.uint8
                        ).astype(np.int32)
                        j += 64
                    elif pq == 1:
                        qt[tq] = np.frombuffer(
                            seg[j : j + 128], dtype=">u2"
                        ).astype(np.int32)
                        j += 128
                    else:
                        return None
            elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline/extended
                prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
                if prec != 8 or h == 0 or w == 0 or nc not in (1, 3):
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 0x0F, tq))
                frame = (h, w, comps)
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive/lossless/arithmetic: codec
            elif marker == 0xC4:  # DHT (possibly several tables)
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0x0F
                    counts = list(seg[j + 1 : j + 17])
                    nsym = sum(counts)
                    symbols = seg[j + 17 : j + 17 + nsym]
                    if len(symbols) != nsym:
                        return None
                    table = _jpeg_build_huff(counts, symbols)
                    (huff_dc if tc == 0 else huff_ac)[th] = table
                    j += 17 + nsym
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                if frame is None or ns != len(frame[2]):
                    return None
                sel = {}
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                    sel[cs] = (tt >> 4, tt & 0x0F)
                scan = (sel, i + 2 + seglen)
                break
            i += 2 + seglen
        if scan is None or frame is None:
            return None
        sel, data_start = scan
        h, w, comps = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if hmax == 0 or vmax == 0:
            return None
        if any(c[1] == 0 or c[2] == 0 or hmax % c[1] or vmax % c[2]
               for c in comps):
            return None
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))

        # entropy-coded segments: un-stuff 0xFF00, split at RSTn
        segments: list[bytes] = []
        cur = bytearray()
        j = data_start
        while j < n:
            b = content[j]
            if b != 0xFF:
                cur.append(b)
                j += 1
                continue
            m = content[j + 1] if j + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                j += 2
            elif 0xD0 <= m <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
            else:  # EOI or any other marker ends the scan
                break
        segments.append(bytes(cur))

        zz = _jpeg_zigzag()
        zrows = np.array([r for r, _ in zz])
        zcols = np.array([c for _, c in zz])
        n_mcus = mcus_x * mcus_y
        per_mcu = restart_interval or n_mcus
        coefs = {}
        for cid, hc, vc, tq in comps:
            if tq not in qt or cid not in sel:
                return None
            if sel[cid][0] not in huff_dc or sel[cid][1] not in huff_ac:
                return None
            coefs[cid] = np.zeros(
                (mcus_y * vc, mcus_x * hc, 8, 8), dtype=np.float64
            )
        seg_idx = 0
        bits = _JpegBits(segments[0])
        pred = {cid: 0 for cid, *_ in comps}
        for mcu in range(n_mcus):
            if mcu and restart_interval and mcu % per_mcu == 0:
                seg_idx += 1  # RST: next segment, predictors reset
                if seg_idx >= len(segments):
                    return None
                bits = _JpegBits(segments[seg_idx])
                pred = {cid: 0 for cid, *_ in comps}
            my, mx = divmod(mcu, mcus_x)
            for cid, hc, vc, tq in comps:
                dc_tab = huff_dc[sel[cid][0]]
                ac_tab = huff_ac[sel[cid][1]]
                q = qt[tq]
                for by in range(vc):
                    for bx in range(hc):
                        blk = np.zeros(64, dtype=np.int32)
                        t = _jpeg_huff_decode(bits, dc_tab)
                        diff = _jpeg_extend(bits.receive(t), t)
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _jpeg_huff_decode(bits, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            blk[k] = _jpeg_extend(bits.receive(s), s)
                            k += 1
                        dq = (blk * q).astype(np.float64)
                        b8 = np.zeros((8, 8))
                        b8[zrows, zcols] = dq
                        coefs[cid][my * vc + by, mx * hc + bx] = b8
        M = _jpeg_dct_matrix()
        out_planes = {}
        for cid, hc, vc, tq in comps:
            F_blocks = coefs[cid]
            spatial = np.einsum(
                "ux,rcuv,vy->rcxy", M, F_blocks, M, optimize=True
            )
            rows, cols = F_blocks.shape[:2]
            plane = (
                spatial.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
                + 128.0
            )
            plane = np.clip(np.rint(plane), 0, 255)
            # upsample to full resolution and crop
            plane = np.repeat(
                np.repeat(plane, vmax // vc, axis=0), hmax // hc, axis=1
            )
            out_planes[cid] = plane[:h, :w]
        if len(comps) == 1:
            return out_planes[comps[0][0]].astype(np.uint8)[:, :, None]
        Y = out_planes[comps[0][0]]
        Cb = out_planes[comps[1][0]] - 128.0
        Cr = out_planes[comps[2][0]] - 128.0
        rgb = np.stack(
            [
                Y + 1.402 * Cr,
                Y - 0.344136 * Cb - 0.714136 * Cr,
                Y + 1.772 * Cb,
            ],
            axis=-1,
        )
        return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    except (EOFError, ValueError, IndexError, struct.error):
        return None


_JPEG_QY_BASE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]  # ITU T.81 Annex K.1 luminance quantization table (natural order)
_JPEG_QC_BASE = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]  # Annex K.2 chrominance table


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF00 byte stuffing and 1-fill
    byte-align (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        if self.n:
            self.bits((1 << (8 - self.n)) - 1, 8 - self.n)


def _jpeg_flat_huff(symbols):
    """A canonical Huffman table giving every occurring symbol the SAME
    code length L (valid while nsym <= 2^L - 1: the all-ones code of a
    length is reserved for longer codes). Decodes everywhere;
    compression is a few percent worse than Annex K's tuned tables —
    the right trade for a dependency-free encoder whose tables need no
    spec transcription. Returns (counts[16], ordered symbols,
    {sym: (code, L)})."""
    syms = sorted(set(symbols)) or [0]
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    return counts, syms, {s: (i, L) for i, s in enumerate(syms)}


def _encode_jpeg_baseline(px, quality: int = 90, sub=(1, 1), restart=0):
    """Spec-valid BASELINE JPEG (SOF0) encoder — stdlib struct + numpy,
    the write-side complement of :func:`_decode_jpeg_pixels` (used by
    :func:`resize_images` to re-emit resized JPEGs with no codec
    installed). Quality-scaled Annex K quantization tables (stored in
    zigzag order per DQT), per-image flat canonical Huffman tables,
    optional chroma subsampling (``sub`` = luma (h, v) factors) and
    restart intervals. ``px``: uint8 (h, w, 3) RGB, (h, w, 1) or (h, w)
    grayscale."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    zz = _jpeg_zigzag()
    zr = np.array([r for r, _ in zz])
    zc = np.array([c for _, c in zz])
    M = _jpeg_dct_matrix()
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qy = np.clip(
        (np.array(_JPEG_QY_BASE).reshape(8, 8) * scale + 50) // 100, 1, 255
    ).astype(np.int32)
    qc = np.clip(
        (np.array(_JPEG_QC_BASE).reshape(8, 8) * scale + 50) // 100, 1, 255
    ).astype(np.int32)

    if gray:
        planes = [(1, px, qy, 0, (1, 1))]  # (cid, plane, q, tq, (hc, vc))
        hmax, vmax = 1, 1
    else:
        R, G, B = px[..., 0], px[..., 1], px[..., 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
        Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0
        hs, vs = sub
        hmax, vmax = hs, vs

        def down(p, fh, fv):
            if fh == 1 and fv == 1:
                return p
            ph = -(-p.shape[0] // fv) * fv
            pw = -(-p.shape[1] // fh) * fh
            pad = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge"
            )
            return pad.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))

        planes = [
            (1, Y, qy, 0, (hs, vs)),
            (2, down(Cb, hs, vs), qc, 1, (1, 1)),
            (3, down(Cr, hs, vs), qc, 1, (1, 1)),
        ]

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component quantized zigzag blocks on the MCU-padded grid; the
    # DCT runs as ONE einsum over each component's block grid
    blocks = {}
    for cid, plane, q, _tq, (hc, vc) in planes:
        bh, bw = mcus_y * vc * 8, mcus_x * hc * 8
        pad = np.pad(
            plane,
            ((0, bh - plane.shape[0]), (0, bw - plane.shape[1])),
            "edge",
        ) - 128.0
        grid4 = (
            pad.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
        )
        Fq = np.rint(
            np.einsum("ux,rcxy,vy->rcuv", M, grid4, M, optimize=True) / q
        ).astype(np.int64)
        blocks[cid] = Fq[:, :, zr, zc]  # (rows, cols, 64) zigzagged

    def mcu_stream():
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for cid, _plane, _q, tq, (hc, vc) in planes:
                for by in range(vc):
                    for bx in range(hc):
                        yield cid, tq, blocks[cid][my * vc + by, mx * hc + bx]

    def symbols_for(blk, pred):
        diff = int(blk[0]) - pred
        s = int(abs(diff)).bit_length()
        dc = (s, (diff if diff >= 0 else diff + (1 << s) - 1, s))
        acs = []
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, (0, 0)))  # ZRL
                run -= 16
            s = abs(v).bit_length()
            acs.append(
                ((run << 4) | s, (v if v >= 0 else v + (1 << s) - 1, s))
            )
            run = 0
        if last < 63:
            acs.append((0x00, (0, 0)))  # EOB
        return dc, acs

    # pass 1: tokenize the interleaved scan WITH restart predictor
    # resets, so pass 2 emits exactly these symbols
    blocks_per_mcu = sum(hc * vc for _c, _p, _q, _t, (hc, vc) in planes)
    per = restart or (mcus_x * mcus_y)
    tokens = []  # (tq, dc_sym, dc_bits, [(ac_sym, (v, s)), ...])
    pred = {cid: 0 for cid, *_ in planes}
    for i, (cid, tq, blk) in enumerate(mcu_stream()):
        mcu = i // blocks_per_mcu
        if restart and mcu and i % (per * blocks_per_mcu) == 0:
            pred = {c: 0 for c, *_ in planes}
        dc, acs = symbols_for(blk, pred[cid])
        pred[cid] = int(blk[0])
        tokens.append((tq, dc[0], dc[1], acs))
    tables = {}
    for tq in (0,) if gray else (0, 1):
        tables[("dc", tq)] = _jpeg_flat_huff(
            [t[1] for t in tokens if t[0] == tq]
        )
        tables[("ac", tq)] = _jpeg_flat_huff(
            [s for t in tokens if t[0] == tq for s, _ in t[3]]
        )

    # pass 2: emit the entropy-coded body
    wtr = _JpegBitWriter()
    body = bytearray()
    for i, (tq, dc_sym, (dv, ds), acs) in enumerate(tokens):
        mcu = i // blocks_per_mcu
        if restart and mcu and i % (per * blocks_per_mcu) == 0:
            wtr.align()
            body.extend(wtr.out)
            wtr = _JpegBitWriter()
            body.extend(b"\xff" + bytes([0xD0 + ((mcu // per - 1) % 8)]))
        code, ln = tables[("dc", tq)][2][dc_sym]
        wtr.bits(code, ln)
        wtr.bits(dv, ds)
        for sym, (v, s) in acs:
            code, ln = tables[("ac", tq)][2][sym]
            wtr.bits(code, ln)
            if s:
                wtr.bits(v, s)
    wtr.align()
    body.extend(wtr.out)

    out = bytearray(b"\xff\xd8")
    for q, tq in ((qy, 0),) if gray else ((qy, 0), (qc, 1)):
        payload = bytes([tq]) + bytes(q[zr, zc].astype(np.uint8))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid, _p, _q, tq, (hc, vc) in planes:
        sof += bytes([cid, (hc << 4) | vc, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for (cls, tq), (counts, syms, _enc) in tables.items():
        tc = 0 if cls == "dc" else 1
        payload = bytes([(tc << 4) | tq]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([nc])
    for cid, _p, _q, tq, _hv in planes:
        sos += bytes([cid, (tq << 4) | tq])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += body + b"\xff\xd9"
    return bytes(out)


def _decode_wav_samples(content: bytes):
    """REAL sample decode for WAV PCM (format code 1; 8/16/32-bit) —
    stdlib struct + numpy. Returns (sample_rate, channels, samples) with
    samples normalized to [-1, 1] float64 (8-bit is unsigned, centered at
    128; 16/32-bit signed), or None for non-PCM/compressed audio (the
    soundfile/ffmpeg hook territory)."""
    import struct

    import numpy as np

    if content is None or len(content) < 36:
        return None
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    i, n = 12, len(content)
    fmt_code = channels = sample_rate = bits = None
    data_off = data_size = None
    while i + 8 <= n:
        cid = content[i : i + 4]
        csize = struct.unpack("<I", content[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            # The chunk's OWN size must cover the 16-byte PCM header: a
            # malformed short fmt chunk would otherwise have sample_rate/
            # bits read from the NEXT chunk's bytes — garbage stats with
            # decode_ok=true instead of a clean None.
            if csize < 16:
                return None
            fmt_code, channels, sample_rate = struct.unpack(
                "<HHI", content[i + 8 : i + 16]
            )
            bits = struct.unpack("<H", content[i + 22 : i + 24])[0]
        elif cid == b"data":
            data_off, data_size = i + 8, csize
        i += 8 + csize + (csize & 1)
    if fmt_code != 1 or not sample_rate or not channels:
        return None
    if bits not in (8, 16, 32) or data_off is None:
        return None
    if data_off + data_size > n:
        return None
    dtype = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
    count = data_size // (bits // 8)
    raw = np.frombuffer(content, dtype=dtype, count=count, offset=data_off)
    if bits == 8:
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        samples = raw.astype(np.float64) / float(2 ** (bits - 1))
    return sample_rate, channels, samples


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """TRUE pixel statistics from the binary column: mean pixel intensity
    in [0, 1] over all stored samples (for 32-bit BMPs and RGBA/gray+
    alpha PNGs that includes the alpha channel — the stat is over the
    decoded array as stored, not an RGB re-projection). Uncompressed BMP
    (:func:`_decode_bmp_pixels`; 8-bit palettes resolved to RGB),
    non-interlaced 8-bit PNG (:func:`_decode_png_pixels`; stdlib zlib +
    all five scanline filters, palettes resolved), and baseline JPEG
    (:func:`_decode_jpeg_pixels`; Huffman + vectorized IDCT, chroma
    upsampled and converted to RGB) decode dependency-free; other real
    formats decode when PIL is installed in the cluster image;
    everything else (synthetic headers, compressed formats without a
    codec) reports ``decode_ok=false`` and NULL stats instead of
    failing the job.

    Scale: mapInPandas, Arrow-batched; pixels never leave their scan
    partition — only the bounded stats projection is emitted."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _pil_module()
        for pdf in it:
            rows = []
            for b in pdf["content"]:
                b = bytes(b) if b is not None else None
                arr = _decode_bmp_pixels(b)
                if arr is None:
                    arr = _decode_png_pixels(b)
                if arr is None:
                    arr = _decode_jpeg_pixels(b)
                if arr is None:
                    arr = _decode_gif_pixels(b)
                if arr is None and b is not None and pil is not None:
                    try:
                        import io

                        import numpy as np

                        img = pil.open(io.BytesIO(b))
                        arr = np.asarray(img.convert("RGB"))
                    except Exception:
                        arr = None
                if arr is None:
                    rows.append((None, None, None, None, False))
                else:
                    h, w, c = arr.shape
                    rows.append(
                        (w, h, c, float(arr.mean()) / 255.0, True)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([r[0] for r in rows], dtype="Int32"),
                    "height": pd.array([r[1] for r in rows], dtype="Int32"),
                    "channels": pd.array([r[2] for r in rows], dtype="Int32"),
                    "mean_pixel": pd.array(
                        [r[3] for r in rows], dtype="float64"
                    ),
                    "decode_ok": [r[4] for r in rows],
                }
            )

    return media.mapInPandas(batches, PIXEL_STATS_SCHEMA)


SAMPLE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("rms_amplitude", T.DoubleType()),
        T.StructField("peak_amplitude", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def audio_sample_stats(media: DataFrame) -> DataFrame:
    """TRUE sample statistics from the binary column: RMS and peak
    amplitude over normalized [-1, 1] samples. WAV PCM decodes
    dependency-free (:func:`_decode_wav_samples`); compressed audio
    reports ``decode_ok=false`` (soundfile/ffmpeg hook territory). Same
    Arrow-batched, shuffle-free shape as :func:`image_pixel_stats`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for b in pdf["content"]:
                d = _decode_wav_samples(
                    bytes(b) if b is not None else None
                )
                if d is None or d[2].size == 0:
                    rows.append((None, None, None, None, None, False))
                else:
                    sr, ch, s = d
                    rows.append(
                        (
                            sr,
                            ch,
                            s.size // ch,
                            float(np.sqrt(np.mean(s * s))),
                            float(np.max(np.abs(s))),
                            True,
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.array(
                        [r[0] for r in rows], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [r[1] for r in rows], dtype="Int32"
                    ),
                    "n_frames": pd.array([r[2] for r in rows], dtype="Int64"),
                    "rms_amplitude": pd.array(
                        [r[3] for r in rows], dtype="float64"
                    ),
                    "peak_amplitude": pd.array(
                        [r[4] for r in rows], dtype="float64"
                    ),
                    "decode_ok": [r[5] for r in rows],
                }
            )

    return media.mapInPandas(batches, SAMPLE_STATS_SCHEMA)


def _encode_wav(samples, sample_rate: int, channels: int) -> bytes:
    """Minimal spec-valid 16-bit PCM WAV writer (RIFF + fmt + data) for
    the dependency-free resample path. ``samples``: float array in
    [-1, 1], interleaved frames (1-D, length = frames * channels)."""
    import struct

    import numpy as np

    pcm = np.clip(
        np.rint(np.asarray(samples, dtype=np.float64) * 32768.0),
        -32768,
        32767,
    ).astype("<i2")
    data = pcm.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def resample_audio(media: DataFrame, target_rate: int) -> DataFrame:
    """Resample WAV PCM rows to ``target_rate`` dependency-free — the
    audio twin of :func:`resize_images`'s real-codec path: decode
    (:func:`_decode_wav_samples`), per-channel LINEAR interpolation at
    the new frame grid (``np.interp`` — the right dependency-free
    baseline; a polyphase windowed-sinc is the quality upgrade when a
    DSP library ships in the cluster image), re-encode as 16-bit PCM
    (:func:`_encode_wav` — 8/32-bit inputs normalize through float and
    come back 16-bit, the training-corpus common denominator). Rows
    already at ``target_rate`` pass through byte-identical; compressed
    audio and garbage pass through UNCHANGED with ``decode_ok=false``
    (report, never die — the :func:`resize_images` contract).

    Scale: mapInPandas, Arrow-batched, no shuffle; samples never leave
    their scan partition."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out, ok = [], []
            for b in pdf["content"]:
                b = bytes(b) if b is not None else None
                d = _decode_wav_samples(b)
                if d is None:
                    out.append(b)
                    ok.append(False)
                    continue
                sr, ch, s = d
                if sr == target_rate:
                    out.append(b)  # already there: untouched bytes
                    ok.append(True)
                    continue
                frames = s.reshape(-1, ch)
                n_in = frames.shape[0]
                n_out = max(1, round(n_in * target_rate / sr))
                # sample positions in input-frame units: index i of the
                # output grid lands at i * (n_in - 1) / (n_out - 1) so
                # the first/last frames map exactly
                if n_out == 1 or n_in == 1:
                    res = np.repeat(frames[:1], n_out, axis=0)
                else:
                    x_out = np.linspace(0.0, n_in - 1.0, n_out)
                    x_in = np.arange(n_in)
                    res = np.stack(
                        [
                            np.interp(x_out, x_in, frames[:, c])
                            for c in range(ch)
                        ],
                        axis=1,
                    )
                out.append(
                    _encode_wav(res.reshape(-1), target_rate, ch)
                )
                ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "content": out,
                    "decode_ok": ok,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def _decode_image_header(content: bytes):
    """Image dimensions without a full decode: the synthetic IMG| header
    (stand-in for full-decode formats), else REAL PNG IHDR / JPEG SOF /
    GIF screen-descriptor / BMP info-header parsing via stdlib struct.
    PIL remains the full-decode hook (resize_images); header metadata
    needs no image library at all."""
    return (
        _parse_fake_header(content)
        or _parse_png_header(content)
        or _parse_jpeg_header(content)
        or _parse_gif_header(content)
        or _parse_bmp_header(content)
    )


def image_metadata(media: DataFrame) -> DataFrame:
    """Extract typed metadata from binary image columns via mapInPandas
    (Arrow-batched; never a per-row Python UDF).

    Scale: embarrassingly parallel per input partition; the binary column
    never shuffles — only the small metadata projection leaves the scan
    stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_image_header(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": [d[0] if d else None for d in decoded],
                    "height": [d[1] if d else None for d in decoded],
                    "channels": [d[2] if d else None for d in decoded],
                    "n_bytes": [
                        len(b) if b is not None else None for b in pdf["content"]
                    ],
                    "decode_ok": [d is not None for d in decoded],
                }
            )

    return media.mapInPandas(batches, IMAGE_META_SCHEMA)


def image_features(media: DataFrame) -> DataFrame:
    """STUB feature extraction: deterministic FEATURE_DIM-dim vector from
    the payload bytes (stands in for a CNN/CLIP embedding; the batch shape,
    Arrow transfer, and output schema are the real thing)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf["content"]:
                if b is None or not b.startswith(b"IMG|"):
                    feats.append(None)
                    continue
                payload = b.split(b"|", 4)[4]
                feats.append(
                    [
                        float(sum(payload[i::FEATURE_DIM]) % 997) / 997.0
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields) + [T.StructField("decode_ok", T.BooleanType())]
)


def _pil_module():
    """Real-codec hook: PIL if installed in the cluster image, else None
    (this environment ships no image libraries — import-gated, never a
    hard dependency)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def _resize_array(arr, max_dim: int):
    """Aspect-preserving AREA resample of an (h, w, ch) uint8 array to
    fit ``max_dim`` — exact box filter for arbitrary (non-integer)
    ratios, computed as two small weight-matrix products (Rh @ plane @
    Rw per channel, one einsum for all channels): each output pixel is
    the area-weighted mean of the input pixels it covers, the same
    anti-aliased semantics PIL's reduce/LANCZOS family approximates.
    Upscaling never happens (scale capped at 1.0 — returns the input
    unchanged)."""
    import numpy as np

    h, w = arr.shape[:2]
    scale = min(1.0, max_dim / max(h, w))
    if scale >= 1.0:
        return arr
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))

    def weights(n_in, n_out):
        s = n_in / n_out
        R = np.zeros((n_out, n_in))
        for j in range(n_out):
            lo, hi = j * s, (j + 1) * s
            i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
            for i in range(i0, min(i1, n_in)):
                R[j, i] = min(hi, i + 1) - max(lo, i)
        return R / s

    Rh = weights(h, nh)
    Rw = weights(w, nw)
    out = np.einsum(
        "yh,hwc,wx->yxc", Rh, arr.astype(np.float64), Rw.T, optimize=True
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _encode_png(arr) -> bytes:
    """Minimal spec-valid PNG writer (stdlib zlib + struct) for the
    dependency-free resize path: 8-bit, filter-None scanlines, color
    type from the channel count (1 gray / 2 gray+alpha / 3 RGB /
    4 RGBA)."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _encode_bmp(arr) -> bytes:
    """Minimal uncompressed BMP writer (BI_RGB, bottom-up) for the
    dependency-free resize path: 3-channel input emits 24-bit BGR,
    4-channel 32-bit BGRA, grayscale is widened to 24-bit."""
    import struct

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch == 1:
        arr = np.repeat(arr, 3, axis=2)
        ch = 3
    elif ch == 2:  # gray+alpha -> BGRA
        arr = np.stack(
            [arr[:, :, 0]] * 3 + [arr[:, :, 1]], axis=2
        )
        ch = 4
    bgr = arr[:, :, [2, 1, 0, 3][:ch]]
    row_bytes = ((w * ch * 8 + 31) // 32) * 4
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * ch] = bgr.reshape(h, w * ch)
    data = rows[::-1].tobytes()  # bottom-up
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, ch * 8, 0, len(data), 2835, 2835, 0, 0
    )
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    return hdr + info + data


def resize_images(media: DataFrame, max_dim: int) -> DataFrame:
    """Aspect-preserving resize to ``max_dim``. FAKE_CODEC binaries get
    their synthetic header rewritten (payload untouched); real BMP, PNG,
    and baseline JPEG rows resize DEPENDENCY-FREE — decode through the
    stdlib codecs, exact area resample (:func:`_resize_array`), and
    re-encode in the same family (BMP->BMP, PNG->PNG, JPEG->baseline
    JPEG at quality 90); images already within ``max_dim`` pass through
    byte-identical with ``decode_ok=true``. Formats beyond the stdlib
    codecs use PIL when the cluster image ships it. Undecodable rows —
    truncated bytes, progressive JPEG with no codec installed, NULLs —
    pass through UNCHANGED with ``decode_ok=false`` instead of failing
    the job: a mixed 100 TB corpus always contains garbage, and a
    resize job must report it, not die on it.

    Scale: mapInPandas (Arrow-batched); binary content stays in its input
    partition — no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _pil_module()
        for pdf in it:
            out, ok = [], []
            for b in pdf["content"]:
                hdr = _parse_fake_header(b)
                if hdr is not None:
                    w, h, c = hdr
                    scale = min(1.0, max_dim / max(w, h))
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    payload = b.split(b"|", 4)[4]
                    out.append(f"IMG|{nw}|{nh}|{c}|".encode() + payload)
                    ok.append(True)
                    continue
                b = bytes(b) if b is not None else None
                # dependency-free path: decode -> area resample ->
                # re-encode in the same format family
                for decode, encode in (
                    (_decode_bmp_pixels, _encode_bmp),
                    (_decode_png_pixels, _encode_png),
                    (_decode_jpeg_pixels, _encode_jpeg_baseline),
                ):
                    arr = decode(b)
                    if arr is not None:
                        if max(arr.shape[:2]) <= max_dim:
                            out.append(b)  # within bounds: untouched
                        else:
                            out.append(encode(_resize_array(arr, max_dim)))
                        ok.append(True)
                        break
                else:
                    if b is not None and pil is not None:
                        try:
                            import io

                            img = pil.open(io.BytesIO(b))
                            img.thumbnail((max_dim, max_dim))
                            buf = io.BytesIO()
                            img.save(buf, format=img.format or "PNG")
                            out.append(buf.getvalue())
                            ok.append(True)
                            continue
                        except Exception:
                            pass  # fall through to pass-through-with-flag
                    out.append(b)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "content": out,
                    "decode_ok": ok,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_index) rows for
    frames a real decoder would extract — pure column ops (sequence +
    explode), no decode needed for planning.

    The decode-and-extract step is the stubbed part; the fan-out shape
    (one row per sampled frame, partitioned by media_id) is real.
    """
    n_frames = (F.length("content") % 100 + 1).alias("n_frames")  # stub count
    return (
        media.select("media_id", n_frames)
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_index"),
        )
    )


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def make_fake_video(n_frames: int, fps: int = 24) -> bytes:
    payload = bytes((n_frames + i) % 251 for i in range(24))
    return f"VID|{n_frames}|{fps}|".encode() + payload


def _parse_mp4_mvhd(content: bytes):
    """Real MP4/MOV duration from the movie header box — stdlib struct
    only. ISO BMFF is a stream of [size(4) + type(4)] boxes; ``moov``
    contains ``mvhd`` whose version selects 32- vs 64-bit fields:
    v0: creation(4) mod(4) timescale(4) duration(4); v1: 8/8/4/8.
    Returns duration seconds (frame count needs a track parse — None)."""
    import struct

    if content is None or len(content) < 16:
        return None

    def walk(lo: int, hi: int, depth: int = 0):
        i = lo
        while i + 8 <= hi:
            size, btype = struct.unpack(">I4s", content[i : i + 8])
            if size < 8:
                return None
            if btype == b"moov" and depth == 0:
                return walk(i + 8, min(i + size, hi), 1)
            if btype == b"mvhd" and depth == 1:
                v = content[i + 8]
                if v == 1 and i + 8 + 4 + 28 <= hi:
                    timescale, duration = struct.unpack(
                        ">IQ", content[i + 28 : i + 40]
                    )
                elif v == 0 and i + 8 + 4 + 16 <= hi:
                    timescale, duration = struct.unpack(
                        ">II", content[i + 20 : i + 28]
                    )
                else:
                    return None
                return (duration / timescale) if timescale else None
            i += size
        return None

    # sanity: a real BMFF stream starts with a well-known box type
    first = content[4:8]
    if first not in (b"ftyp", b"moov", b"mdat", b"free", b"wide", b"skip"):
        return None
    return walk(0, len(content))


def video_metadata(media: DataFrame) -> DataFrame:
    """Video metadata: the synthetic VID header (full-decode stand-in:
    frame count + fps), else REAL MP4/MOV duration from the mvhd box via
    stdlib struct. Frame ACCESS (decode, sampling execution) stays behind
    the ffmpeg hook; :func:`frame_sample_plan` plans the fan-out."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dur, nfr, ok = [], [], []
            for b in pdf["content"]:
                if b is not None and bytes(b).startswith(b"VID|"):
                    try:
                        _, n, fps, _rest = bytes(b).split(b"|", 3)
                        n, fps = int(n), int(fps)
                        dur.append(n / fps if fps else None)
                        nfr.append(n)
                        ok.append(True)
                        continue
                    except (ValueError, IndexError):
                        pass
                d = _parse_mp4_mvhd(bytes(b) if b is not None else None)
                dur.append(d)
                nfr.append(None)
                ok.append(d is not None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_s": pd.array(dur, dtype="float64"),
                    "n_frames": pd.array(nfr, dtype="Int64"),
                    "n_bytes": [
                        len(b) if b is not None else None
                        for b in pdf["content"]
                    ],
                    "decode_ok": ok,
                }
            )

    return media.mapInPandas(batches, VIDEO_META_SCHEMA)
