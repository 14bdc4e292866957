"""Pure-stdlib codec unit tests (round-4 real multimodal decode)."""

from __future__ import annotations

import struct
import zlib

from blarify_spark.functions import codecs


def _png(width: int, height: int) -> bytes:
    """Minimal valid PNG (8-bit grayscale, zlib-deflated rows)."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG prefix: SOI + APP0 + SOF0 (enough for dim parsing)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def test_sniff_formats():
    assert codecs.sniff_format(_png(3, 2)) == "png"
    assert codecs.sniff_format(b"GIF89a" + bytes(8)) == "gif"
    assert codecs.sniff_format(codecs.make_bmp(1, 1, b"\x01\x02\x03")) == "bmp"
    assert codecs.sniff_format(_jpeg(5, 7)) == "jpeg"
    assert codecs.sniff_format(codecs.make_wav(10)) == "wav"
    assert codecs.sniff_format(codecs.make_rvid(1, 1, [b"x"])) == "rvid"
    assert codecs.sniff_format(b"not a format") is None
    assert codecs.sniff_format(None) is None


def test_image_dims_all_headers():
    assert codecs.image_dims(_png(13, 7)) == (13, 7)
    gif = b"GIF89a" + struct.pack("<HH", 40, 30) + bytes(4)
    assert codecs.image_dims(gif) == (40, 30)
    bmp = codecs.make_bmp(4, 3, bytes(36))
    assert codecs.image_dims(bmp) == (4, 3)
    assert codecs.image_dims(_jpeg(21, 9)) == (21, 9)
    # truncated headers fail instead of misparsing
    assert codecs.image_dims(bmp[:6]) is None
    assert codecs.image_dims(_png(5, 5)[:10]) is None


def test_bmp_roundtrip_and_resize():
    # 2x2 image, distinct pixels (BGR): decode must return what we encoded
    px = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    bmp = codecs.make_bmp(2, 2, px)
    w, h, buf = codecs.bmp_pixels(bmp)
    assert (w, h) == (2, 2) and buf == px
    # nearest-neighbor 2x2 -> 1x1 picks pixel (0,0)
    small = codecs.bmp_resize(bmp, 1, 1)
    assert codecs.image_dims(small) == (1, 1)
    assert codecs.bmp_pixels(small)[2] == px[:3]
    # 2x2 -> 4x4 repeats each pixel in 2x2 blocks
    big = codecs.bmp_resize(bmp, 4, 4)
    bw, bh, bbuf = codecs.bmp_pixels(big)
    assert (bw, bh) == (4, 4)
    assert bbuf[0:3] == bbuf[3:6] == px[0:3]  # top-left block
    assert bbuf[6:9] == px[3:6]


def test_png_roundtrip_and_filtered_decode():
    """Encoder->decoder round trip, plus a decode of an externally
    FILTERED stream (Sub/Up/Average/Paeth rows) so the unfilter logic is
    exercised against ground truth, not just our own filter-0 encoder."""
    px = bytes([(i * 37) % 256 for i in range(6 * 4 * 3)])
    png = codecs.make_png(6, 4, px)
    assert codecs.sniff_format(png) == "png"
    assert codecs.image_dims(png) == (6, 4)
    w, h, buf = codecs.png_pixels(png)
    assert (w, h, buf) == (6, 4, px)
    assert codecs.image_pixels(png) == (6, 4, px)

    # hand-build a 2x4 RGB PNG using one row of each filter type 1-4
    import struct as st
    import zlib

    def chunk(typ, data):
        return (
            st.pack(">I", len(data))
            + typ
            + data
            + st.pack(">I", zlib.crc32(typ + data))
        )

    rows_rgb = [bytes([10, 20, 30, 40, 50, 60]),
                bytes([15, 25, 35, 45, 55, 65]),
                bytes([100, 110, 120, 130, 140, 150]),
                bytes([101, 111, 121, 131, 141, 151])]

    def filt(f, row, prev):
        ch = 3
        out = bytearray([f])
        for x in range(len(row)):
            left = row[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 1:
                out.append((row[x] - left) & 0xFF)
            elif f == 2:
                out.append((row[x] - up) & 0xFF)
            elif f == 3:
                out.append((row[x] - ((left + up) >> 1)) & 0xFF)
            else:
                out.append((row[x] - codecs._paeth(left, up, ul)) & 0xFF)
        return bytes(out)

    raw = b""
    prev = bytes(6)
    for f, row in zip([1, 2, 3, 4], rows_rgb):
        raw += filt(f, row, prev)
        prev = row
    ihdr = st.pack(">IIBBBBB", 2, 4, 8, 2, 0, 0, 0)
    png2 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w2, h2, buf2 = codecs.png_pixels(png2)
    assert (w2, h2) == (2, 4)
    # decoder emits BGR; source rows are RGB
    want = b"".join(
        bytes((r[i + 2], r[i + 1], r[i])) for r in rows_rgb for i in (0, 3)
    )
    assert buf2 == want
    # resize accepts PNG input and emits a decodable BMP
    out = codecs.image_resize(png, 3, 2)
    assert codecs.image_dims(out) == (3, 2)
    # grayscale PNG decodes to replicated channels
    gray = _png(4, 2)  # the zero-filled gray helper above
    gw, gh, gbuf = codecs.png_pixels(gray)
    assert (gw, gh) == (4, 2) and gbuf == bytes(4 * 2 * 3)


def test_wav_real_pcm_stats():
    wav = codecs.make_wav(800, rate=8000, seed=3)
    info = codecs.wav_info(wav)
    assert info["channels"] == 1
    assert info["rate"] == 8000
    assert info["n_frames"] == 800
    assert info["duration_ms"] == 100
    assert info["rms"] > 0  # energy of the actual samples
    # silence really measures as silence
    silent = codecs.make_wav(0)
    assert codecs.wav_info(silent)["rms"] == 0
    assert codecs.wav_info(b"RIFF1234WAVE") is None


def test_rvid_container_validates_length():
    frames = [bytes([i] * 4) for i in range(3)]
    clip = codecs.make_rvid(2, 2, frames)
    assert codecs.rvid_info(clip) == (2, 2, 3)
    assert codecs.rvid_frame(clip, 1) == frames[1]
    assert codecs.rvid_frame(clip, 3) is None
    # truncation is detected (header promises more bytes than present)
    assert codecs.rvid_info(clip[:-1]) is None


def test_gif_lzw_roundtrip_and_dispatch():
    """make_gif -> gif_pixels round trip with real LZW table growth
    (VERDICT r04 #6), plus image_pixels dispatch."""
    w, h = 37, 23
    px = b"".join(
        bytes(((x // 4 * 40) % 256, (y // 4 * 30) % 256, 128))
        for y in range(h)
        for x in range(w)
    )
    gif = codecs.make_gif(w, h, px)
    assert codecs.sniff_format(gif) == "gif"
    assert codecs.image_dims(gif) == (w, h)
    assert codecs.gif_pixels(gif) == (w, h, px)
    assert codecs.image_pixels(gif) == (w, h, px)
    # resize accepts GIF input now
    out = codecs.image_resize(gif, 5, 5)
    assert codecs.image_dims(out) == (5, 5)
    # 2-color minimum-palette path
    px2 = b"".join(
        b"\x00\x00\x00" if (x + y) % 2 else b"\xff\xff\xff"
        for y in range(8)
        for x in range(8)
    )
    assert codecs.gif_pixels(codecs.make_gif(8, 8, px2))[2] == px2


def test_gif_decodes_hand_packed_external_lzw_stream():
    """Pin the decoder against a hand-packed LZW stream derived from the
    GIF89a spec's bit-packing rules (ground truth independent of our own
    encoder): 3x1 image, palette [red, blue], indices 0,1,0 with
    min_code_size=2 packs to bytes 44 50."""
    import struct as st

    palette = b"\xff\x00\x00" + b"\x00\x00\xff" + b"\x00" * 6  # 4 slots
    gif = (
        b"GIF89a"
        + st.pack("<HHBBB", 3, 1, 0xF1, 0, 0)  # GCT, 2 bits -> 4 colors
        + palette
        + st.pack("<BHHHHB", 0x2C, 0, 0, 3, 1, 0)
        + bytes([2])  # LZW min code size
        + bytes([2, 0x44, 0x50])  # one sub-block: clear,0,1,0,end
        + b"\x00\x3b"
    )
    got = codecs.gif_pixels(gif)
    # decoder emits BGR: red -> 00 00 ff, blue -> ff 00 00
    assert got == (3, 1, b"\x00\x00\xff\xff\x00\x00\x00\x00\xff")


def test_gif_interlace_and_subframe_composition():
    """An interlaced frame must be row-reordered; a frame smaller than
    the logical screen composes onto a background-filled canvas."""
    import struct as st

    # 2x2 frame at offset (1,1) of a 4x4 screen, bg color index 1
    palette = b"\x00\xff\x00" + b"\xff\xff\x00" + b"\x00" * 6
    indices = bytes([0, 1, 1, 0])
    lzw = codecs._lzw_encode(indices, 2)
    gif = (
        b"GIF89a"
        + st.pack("<HHBBB", 4, 4, 0xF1, 1, 0)
        + palette
        + st.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
        + bytes([2, len(lzw)])
        + lzw
        + b"\x00\x3b"
    )
    sw, sh, buf = codecs.gif_pixels(gif)
    assert (sw, sh) == (4, 4)
    bg = b"\x00\xff\xff"  # yellow (BGR)
    green = b"\x00\xff\x00"
    px = {(x, y): buf[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3] for y in range(4) for x in range(4)}
    assert px[(0, 0)] == bg and px[(3, 3)] == bg
    assert px[(1, 1)] == green and px[(2, 2)] == green
    assert px[(2, 1)] == bg and px[(1, 2)] == bg  # index 1 == bg color here

    # interlaced 2-pass-visible case: 4 rows, each row a solid color idx
    rows = [0, 1, 0, 1]
    seq = bytes(r for r in rows for _ in range(2))  # 2 wide
    # interlaced row order for h=4: pass1 row0, pass3 row2, pass4 rows 1,3
    inter_order = [0, 2, 1, 3]
    inter_seq = bytes(rows[r] for r in inter_order for _ in range(2))
    lzw_i = codecs._lzw_encode(inter_seq, 2)
    gif_i = (
        b"GIF89a"
        + st.pack("<HHBBB", 2, 4, 0xF1, 0, 0)
        + palette
        + st.pack("<BHHHHB", 0x2C, 0, 0, 2, 4, 0x40)  # interlace flag
        + bytes([2, len(lzw_i)])
        + lzw_i
        + b"\x00\x3b"
    )
    _, _, buf_i = codecs.gif_pixels(gif_i)
    want = b"".join(
        (b"\x00\xff\x00" if r == 0 else b"\x00\xff\xff") * 2 for r in rows
    )
    assert buf_i == want


def test_gif_corrupt_streams_fail_cleanly():
    assert codecs.gif_pixels(b"GIF89a") is None
    px = bytes(4 * 4 * 3)
    gif = bytearray(codecs.make_gif(4, 4, px))
    assert codecs.gif_pixels(bytes(gif)) is not None
    truncated = bytes(gif[:20])
    assert codecs.gif_pixels(truncated) is None


# ---------------------------------------------------------------------------
# Baseline JPEG codec (functions/jpeg.py)
# ---------------------------------------------------------------------------


def _smooth_bgr(w: int, h: int) -> bytes:
    # non-wrapping gradient: no discontinuities, so quantization error
    # stays small everywhere (no Gibbs ringing)
    return bytes(
        min(255, (x * 4 + y * 2 + k * 10))
        for y in range(h)
        for x in range(w)
        for k in range(3)
    )


def test_jpeg_flat_field_roundtrips_near_exact():
    import numpy as np

    from blarify_spark.functions import jpeg

    w, h = 16, 12
    flat = bytes([120, 80, 200]) * (w * h)
    for ss in (False, True):
        dec = jpeg.jpeg_pixels(jpeg.make_jpeg(w, h, flat, subsample=ss))
        assert dec is not None and dec[:2] == (w, h)
        a = np.frombuffer(dec[2], np.uint8).astype(int)
        e = np.frombuffer(flat, np.uint8).astype(int)
        # flat field = DC-only blocks: survives quantization within 1
        assert np.abs(a - e).max() <= 1


def test_jpeg_smooth_gradient_within_quant_error():
    import numpy as np

    from blarify_spark.functions import jpeg

    w, h = 24, 17  # non-multiple-of-8/16: exercises edge padding + crop
    img = _smooth_bgr(w, h)
    for ss in (False, True):
        dec = jpeg.jpeg_pixels(jpeg.make_jpeg(w, h, img, subsample=ss))
        assert dec is not None and dec[:2] == (w, h)
        a = np.frombuffer(dec[2], np.uint8).astype(int)
        e = np.frombuffer(img, np.uint8).astype(int)
        assert np.abs(a - e).mean() < 4.0
        assert np.abs(a - e).max() < 32


def test_jpeg_restart_markers_roundtrip():
    import numpy as np

    from blarify_spark.functions import jpeg

    w, h = 40, 24
    img = _smooth_bgr(w, h)
    base = jpeg.jpeg_pixels(jpeg.make_jpeg(w, h, img))
    for rst in (1, 2, 3):
        enc = jpeg.make_jpeg(w, h, img, restart=rst)
        assert b"\xff\xdd" in enc  # DRI segment present
        dec = jpeg.jpeg_pixels(enc)
        assert dec is not None
        # restart changes framing, not pixels: same decode as no-restart
        assert dec == base


def test_jpeg_fill_bytes_between_segments_accepted():
    """ADVICE r05: spec-legal 0xFF fill bytes between segments (ITU-T
    T.81 B.1.1.2) must not derail the marker walk — the marker code is
    the byte after the LAST 0xFF of the run."""
    from blarify_spark.functions import jpeg

    w, h = 24, 17
    enc = jpeg.make_jpeg(w, h, _smooth_bgr(w, h))
    base = jpeg.jpeg_pixels(enc)
    assert base is not None
    # pad the gap before the DQT segment with a run of fill bytes
    i = enc.index(b"\xff\xdb")
    padded = enc[:i] + b"\xff" * 5 + enc[i:]
    assert jpeg.jpeg_pixels(padded) == base


def test_jpeg_boundary_rst_without_dri_tolerated():
    """An RST landing exactly on an MCU boundary but without matching
    DRI bookkeeping (encoder quirk) is consumed and predictors reset —
    the decode equals the with-DRI decode, no skipped blocks."""
    from blarify_spark.functions import jpeg

    w, h = 40, 24
    img = _smooth_bgr(w, h)
    base = jpeg.jpeg_pixels(jpeg.make_jpeg(w, h, img))
    enc = jpeg.make_jpeg(w, h, img, restart=2)
    i = enc.index(b"\xff\xdd")
    stripped = enc[:i] + enc[i + 6 :]  # excise the DRI segment entirely
    assert b"\xff\xdd" not in stripped
    assert jpeg.jpeg_pixels(stripped) == base


def test_jpeg_unexpected_rst_mid_mcu_is_decode_error():
    """ADVICE r05: an RST arriving MID-MCU must be a clean None — the
    former tolerance skipped the rest of the MCU and silently emitted
    zero-initialized (mid-gray) blocks."""
    from blarify_spark.functions import jpeg

    w, h = 40, 24
    enc = jpeg.make_jpeg(w, h, _smooth_bgr(w, h))
    sos = enc.index(b"\xff\xda")
    (seglen,) = __import__("struct").unpack(">H", enc[sos + 2 : sos + 4])
    scan_start = sos + 2 + seglen
    # inject an RST one byte into the entropy stream: mid-MCU 0
    corrupt = enc[: scan_start + 1] + b"\xff\xd0" + enc[scan_start + 1 :]
    assert jpeg.jpeg_pixels(corrupt) is None


def test_jpeg_dispatch_dims_and_failures():
    from blarify_spark.functions import codecs, jpeg

    w, h = 21, 9
    enc = jpeg.make_jpeg(w, h, _smooth_bgr(w, h))
    # the generic dispatchers route JPEG to the real decoder
    assert codecs.image_dims(enc) == (w, h)
    px = codecs.image_pixels(enc)
    assert px is not None and px[:2] == (w, h)
    resized = codecs.image_resize(enc, 8, 8)
    assert resized is not None and codecs.sniff_format(resized) == "bmp"
    assert codecs.bmp_pixels(resized)[:2] == (8, 8)
    # truncation and mid-stream corruption fail cleanly
    assert jpeg.jpeg_pixels(enc[:6]) is None
    assert jpeg.jpeg_pixels(enc[:40]) is None
    assert jpeg.jpeg_pixels(b"\xff\xd8" + b"\x00" * 64) is None
    # progressive SOF2 is refused (never misparsed): swap SOF0 -> SOF2
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert jpeg.jpeg_pixels(prog) is None


def test_jpeg_quant_tables_written_in_zigzag_order():
    from blarify_spark.functions import jpeg

    enc = jpeg.make_jpeg(8, 8, bytes(8 * 8 * 3))
    i = enc.index(b"\xff\xdb")
    seg = enc[i + 5 : i + 5 + 64]  # first DQT payload, zigzag order
    flat = jpeg.QT_LUM.flatten()
    expect = bytes(int(flat[j]) for j in jpeg.ZZ_FLAT)
    assert seg == expect
    # spec zigzag prefix: natural indices 0,1,8,16,9,2,3,10
    assert list(jpeg.ZZ_FLAT[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]
