"""Multimodal plumbing tests: binary columns, metadata, mapInPandas
featurizer (stubbed codec), frame sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from df_spark import multimodal as M
from df_spark.sources.tables import load_sdf


def media_df(spark, sf_dir):
    docs = load_sdf(spark, sf_dir, "documents").limit(20)
    return M.documents_as_media(docs)


def test_attach_media_meta(spark, sf_dir):
    df = M.attach_media_meta(media_df(spark, sf_dir))
    row = df.filter(F.col("media_id") == 0).collect()[0]
    assert row.meta.n_bytes == len(row.payload)
    assert row.meta.content_md5 == hashlib.md5(bytes(row.payload)).hexdigest()


def test_featurize_stub(spark, sf_dir):
    feats = M.featurize(media_df(spark, sf_dir)).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.feature) == M.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.feature)
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in M.featurize(media_df(spark, sf_dir)).collect()}
    for r in feats:
        assert again[r.media_id] == r.feature


def test_real_codec_is_explicit_stub(spark, sf_dir):
    with pytest.raises(Exception, match="no codec"):
        M.featurize(media_df(spark, sf_dir), use_stub=False).collect()


def test_frame_sample(spark, sf_dir):
    frames = M.frame_sample(media_df(spark, sf_dir), every_n_bytes=64)
    rows = frames.filter(F.col("media_id") == 0).orderBy("frame_no").collect()
    src = media_df(spark, sf_dir).filter(F.col("media_id") == 0).collect()[0]
    n_expected = (len(src.payload) + 63) // 64
    assert len(rows) == n_expected
    rebuilt = b"".join(bytes(r.frame_bytes) for r in rows)
    assert rebuilt == bytes(src.payload)


def _bmp_bytes(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal uncompressed 24-bit BMP, solid color, bottom-up rows."""
    import struct

    row_bytes = (width * 3 + 3) & ~3
    pixel_data = bytearray()
    row = bytes([rgb[2], rgb[1], rgb[0]]) * width + b"\x00" * (row_bytes - width * 3)
    for _ in range(height):
        pixel_data += row
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    return header + info + bytes(pixel_data)


def _wav_bytes(rate: int, n_frames: int, amplitude: int) -> bytes:
    """Minimal 16-bit mono PCM WAV: a square wave at fixed amplitude."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = struct.pack(
            f"<{n_frames}h",
            *[amplitude if i % 2 == 0 else -amplitude for i in range(n_frames)])
        w.writeframes(frames)
    return buf.getvalue()


def test_real_codec_decodes_bmp_and_wav(spark):
    """The de-stubbed codec path: real dimensions / duration from real
    bytes, through the same distributed mapInPandas plan as the stub."""
    rows = [
        (1, "image", _bmp_bytes(6, 4, (255, 0, 0)), "fixture"),
        (2, "audio", _wav_bytes(8000, 4000, 16384), "fixture"),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary, source string")
    feats = {r.media_id: r.feature for r in M.featurize(df, use_stub=False).collect()}
    img = feats[1]
    assert img[0] == 6.0 and img[1] == 4.0          # width, height
    assert abs(img[2] - 1.0) < 1e-6                  # mean R (solid red)
    assert img[3] == 0.0 and img[4] == 0.0           # mean G, B
    assert img[6] == 24.0 and img[7] == 1.0          # bpp, image tag
    aud = feats[2]
    assert aud[0] == 1.0 and aud[1] == 8000.0        # mono, sample rate
    assert abs(aud[3] - 0.5) < 1e-9                  # duration = 4000/8000 s
    assert abs(aud[4] - 0.5) < 1e-3                  # RMS of +/-16384 square
    assert aud[7] == 2.0                             # audio tag


def _png_bytes(width: int, height: int, color_type: int = 2,
               filters: tuple[int, ...] | None = None) -> bytes:
    """Minimal 8-bit truecolor PNG built with stdlib zlib: a horizontal
    red→blue gradient (distinct per-pixel values so every filter type
    actually transforms the data), one filter byte per scanline."""
    import struct
    import zlib

    ch = 3 if color_type == 2 else 4

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    def px(x: int, y: int) -> bytes:
        r = (x * 255) // max(width - 1, 1)
        g = (y * 255) // max(height - 1, 1)
        b = 255 - r
        return bytes((r, g, b) if ch == 3 else (r, g, b, 200))

    def filt(ftype: int, line: bytes, prev: bytes) -> bytes:
        out = bytearray(line)
        if ftype == 1:
            for i in range(len(line) - 1, ch - 1, -1):
                out[i] = (line[i] - line[i - ch]) & 0xFF
        elif ftype == 2:
            for i in range(len(line)):
                out[i] = (line[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(len(line)):
                a = line[i - ch] if i >= ch else 0
                out[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(len(line)):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (line[i] - pr) & 0xFF
        return bytes(out)

    filters = filters or tuple((y % 5) for y in range(height))
    raw = bytearray()
    prev = bytes(width * ch)
    for y in range(height):
        line = b"".join(px(x, y) for x in range(width))
        raw += bytes([filters[y]]) + filt(filters[y], line, prev)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_real_codec_decodes_png_all_filters(spark):
    """PNG decode through the distributed featurizer: a gradient image
    encoded with every scanline filter type (None/Sub/Up/Average/Paeth)
    must unfilter back to the exact per-channel means, for both RGB and
    RGBA."""
    width, height = 8, 10
    exp_r = sum((x * 255) // (width - 1) for x in range(width)) / width / 255.0
    exp_g = sum((y * 255) // (height - 1) for y in range(height)) / height / 255.0
    exp_b = 1.0 - exp_r
    rows = [
        (1, "image", _png_bytes(width, height, color_type=2), "fixture"),
        (2, "image", _png_bytes(width, height, color_type=6), "fixture"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, source string")
    feats = {r.media_id: r.feature for r in M.featurize(df, use_stub=False).collect()}
    for mid, bits in ((1, 24.0), (2, 32.0)):
        f = feats[mid]
        assert f[0] == float(width) and f[1] == float(height)
        assert abs(f[2] - exp_r) < 1e-6
        assert abs(f[3] - exp_g) < 1e-6
        assert abs(f[4] - exp_b) < 1e-6
        assert f[6] == bits and f[7] == 1.0


def test_png_unsupported_variants_raise():
    """Palette/16-bit/interlaced PNGs stay on the documented
    NotImplementedError path."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    for depth, ctype_, interlace in ((8, 3, 0), (16, 2, 0), (8, 2, 1)):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype_, 0, 0, interlace)
        payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            M._decode_png(payload)


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Reference GIF-LZW compressor (variable-width codes, LSB-first)
    so the decoder is tested against a spec-conformant stream with
    dictionary growth and code-size bumps, not a degenerate
    clear-per-pixel encoding."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    dict_ = {bytes([i]): i for i in range(1 << min_code)}
    next_code = eoi + 1
    code_size = min_code + 1
    emitted: list[tuple[int, int]] = [(clear, code_size)]
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in dict_:
            w = wk
            continue
        emitted.append((dict_[w], code_size))
        if next_code < 4096:
            dict_[wk] = next_code
            next_code += 1
            # encoder runs one dict entry ahead of the decoder, so the
            # width bump fires at (1<<size)+1 where the decoder's fires
            # at (1<<size)
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = bytes([k])
    if w:
        emitted.append((dict_[w], code_size))
    emitted.append((eoi, code_size))
    bitbuf = bitlen = 0
    out = bytearray()
    for code, size in emitted:
        bitbuf |= code << bitlen
        bitlen += size
        while bitlen >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8
    if bitlen:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_GIF_PALETTE = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]


def _gif_bytes(width: int, height: int, indices: bytes,
               interlaced: bool = False) -> bytes:
    """Minimal GIF89a: global 4-color table, one image descriptor, a
    graphic-control extension block (exercises the extension-skip
    path), real LZW-compressed data split into sub-blocks."""
    import struct

    min_code = 2
    palette = b"".join(bytes(c) for c in _GIF_PALETTE)
    lzw = _gif_lzw_encode(indices, min_code)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i:i + 255]
        blocks += bytes([len(part)]) + part
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x80 | 0x01, 0, 0)  # 4-entry GCT
        + palette
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height,
                                0x40 if interlaced else 0)
        + bytes([min_code]) + bytes(blocks) + b"\x00"
        + b"\x3b"
    )


def test_real_codec_decodes_gif(spark):
    """GIF decode through the distributed featurizer: LZW stream with
    real dictionary growth (repeating runs force the code==len(table)
    self-referential case) must resolve to exact palette means; the
    interlace flag changes nothing because channel means are
    order-independent."""
    width, height = 10, 8
    # runs of equal indices: 'aaaa...' patterns hit the KwKwK case
    indices = bytes((x // 3 + y) % 4 for y in range(height) for x in range(width))
    n = len(indices)
    exp = [sum(_GIF_PALETTE[i][c] for i in indices) / n / 255.0 for c in range(3)]
    rows = [
        (1, "image", _gif_bytes(width, height, indices), "fixture"),
        (2, "image", _gif_bytes(width, height, indices, interlaced=True), "fixture"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, source string")
    feats = {r.media_id: r.feature for r in M.featurize(df, use_stub=False).collect()}
    for mid in (1, 2):
        f = feats[mid]
        assert f[0] == float(width) and f[1] == float(height)
        assert abs(f[2] - exp[0]) < 1e-6
        assert abs(f[3] - exp[1]) < 1e-6
        assert abs(f[4] - exp[2]) < 1e-6
        assert f[7] == 1.0


def test_gif_unsupported_variants_raise():
    import struct

    # no color table at all
    payload = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0)
               + b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
               + b"\x02\x00\x3b")
    with pytest.raises(NotImplementedError):
        M._decode_gif(payload)
    with pytest.raises(NotImplementedError):
        M._decode_gif(b"NOTGIF00")


def _jpeg_bytes(width, height, n_comp=3, precision=8, sof=0xC0,
                progressive_junk=True):
    """Minimal structurally-valid JPEG up to the frame header: SOI,
    APP0/JFIF, a DQT segment, then SOFn — enough for the metadata
    parse (no scan data needed)."""
    import struct

    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    comps = b"".join(
        struct.pack("BBB", cid + 1, 0x11 if cid else 0x22, 0)
        for cid in range(n_comp)
    )
    sof_seg = bytes([0xFF, sof]) + struct.pack(
        ">HBHHB", 8 + 3 * n_comp, precision, height, width, n_comp) + comps
    junk = dqt if progressive_junk else b""
    return b"\xff\xd8" + app0 + junk + sof_seg + b"\xff\xd9"


def test_real_codec_decodes_jpeg_metadata(spark):
    """JPEG frame-header parse through the distributed featurizer:
    real dimensions / bits-per-pixel from SOF0 (baseline) and SOF2
    (progressive); channel means carry the -1.0 meta-only sentinel —
    the documented no-IDCT honesty contract."""
    rows = [
        (1, "image", _jpeg_bytes(640, 480), "fixture"),
        (2, "image", _jpeg_bytes(31, 17, sof=0xC2), "fixture"),  # progressive
        (3, "image", _jpeg_bytes(12, 12, n_comp=1), "fixture"),  # grayscale
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, source string")
    feats = {r.media_id: r.feature for r in M.featurize(df, use_stub=False).collect()}
    assert feats[1][:2] == [640.0, 480.0]
    assert feats[1][2:5] == [-1.0, -1.0, -1.0]
    assert feats[1][6] == 24.0 and feats[1][7] == 1.0
    assert feats[2][:2] == [31.0, 17.0]
    assert abs(feats[2][5] - 31.0 / 17.0) < 1e-6
    assert feats[3][:2] == [12.0, 12.0] and feats[3][6] == 8.0


def test_jpeg_unsupported_variants_raise():
    # lossless SOF3 stays an explicit NotImplementedError
    with pytest.raises(NotImplementedError, match="SOF3"):
        M._decode_jpeg(_jpeg_bytes(8, 8, sof=0xC3))
    # arithmetic-coded progressive SOF10
    with pytest.raises(NotImplementedError, match="SOF10"):
        M._decode_jpeg(_jpeg_bytes(8, 8, sof=0xCA))
    # EOI before any SOF
    with pytest.raises(NotImplementedError, match="no JPEG frame header"):
        M._decode_jpeg(b"\xff\xd8\xff\xd9")
    # truncated segment length
    with pytest.raises(NotImplementedError, match="truncated"):
        M._decode_jpeg(b"\xff\xd8\xff\xe0\xff\xff")
    # degenerate zero-width frame
    with pytest.raises(NotImplementedError, match="degenerate"):
        M._decode_jpeg(_jpeg_bytes(0, 8))
    with pytest.raises(NotImplementedError, match="not a JPEG"):
        M._decode_jpeg(b"NOPE")


def test_real_codec_unknown_format_still_raises(spark):
    df = spark.createDataFrame(
        [(1, "video", b"\x00\x01\x02\x03mpeg?", "fixture")],
        "media_id long, kind string, payload binary, source string")
    with pytest.raises(Exception, match="no codec"):
        M.featurize(df, use_stub=False).collect()
