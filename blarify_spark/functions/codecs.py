"""Pure-stdlib media codecs for the multimodal operators.

The sandbox has NO image/av libraries (probed round-4: PIL, av, cv2,
imageio, soundfile all absent — only stdlib `wave`/`audioop`), so the
multimodal stages previously hash-faked their features. This module
replaces the fakes with REAL byte-level decoding that needs no external
codec:

* format sniffing from magic bytes (png/gif/bmp/jpeg/wav/rvid)
* image dimensions parsed from the actual container headers
  (PNG IHDR, GIF logical screen descriptor, BMP BITMAPINFOHEADER,
  JPEG SOF marker walk)
* full pixel decode + nearest-neighbor resize + re-encode for
  uncompressed 24bpp BMP (the format synth media uses, so the resize
  stage is a genuine decode→transform→encode)
* GIF first-frame pixel decode — sub-block reassembly, variable-width
  LZW inflate (CLEAR/END, KwKwK, growth to 12 bits), de-interlace,
  palette mapping onto the logical screen — plus a matching LZW
  encoder in make_gif so tests exercise real table growth.
* baseline JPEG encode + FULL pixel decode (functions/jpeg.py since
  round 5: Huffman entropy decode, dequant, IDCT, chroma upsampling,
  restart intervals) — progressive/arithmetic refused cleanly.
* WAV PCM decode via stdlib `wave` + `audioop` (channels, rate, frames,
  RMS energy)
* RVID — a tiny DOCUMENTED toy video container
  (b"RVID" | u16 w | u16 h | u32 n_frames | n_frames * (w*h) grayscale
  bytes) so frame sampling parses real frame bytes instead of inventing
  counts. It is NOT a standard codec: swapping in a real libav/PIL
  backend replaces only these parser functions — every Spark-side
  signature stays identical. If PIL becomes importable, `HAVE_PIL` flips
  and callers may prefer it.
"""

from __future__ import annotations

import io
import struct
import wave

try:  # removed from the stdlib in Python 3.13 — keep a pure fallback
    import audioop

    def _rms(frames: bytes, width: int) -> int:
        return audioop.rms(frames, width)

except ImportError:  # pragma: no cover - environment-dependent

    def _rms(frames: bytes, width: int) -> int:
        if width != 2 or not frames:
            return 0
        n = len(frames) // 2
        total = 0
        for (v,) in struct.iter_unpack("<h", frames[: n * 2]):
            total += v * v
        return int((total / n) ** 0.5) if n else 0

try:  # probe recorded in COVERAGE.md: absent in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover - environment-dependent
    HAVE_PIL = False


# ---------------------------------------------------------------------------
# Sniffing
# ---------------------------------------------------------------------------


def sniff_format(payload: bytes | None) -> str | None:
    if not payload:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RVID":
        return "rvid"
    return None


# ---------------------------------------------------------------------------
# Image header parsing (real container headers, no pixel codec needed)
# ---------------------------------------------------------------------------


def image_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the container header, or None."""
    fmt = sniff_format(payload)
    try:
        if fmt == "png":
            # IHDR is always the first chunk: length(4) type(4) data
            w, h = struct.unpack(">II", payload[16:24])
            return int(w), int(h)
        if fmt == "gif":
            w, h = struct.unpack("<HH", payload[6:10])
            return int(w), int(h)
        if fmt == "bmp":
            w, h = struct.unpack("<ii", payload[18:26])
            return int(w), abs(int(h))  # negative height = top-down rows
        if fmt == "jpeg":
            return _jpeg_dims(payload)
    except (struct.error, IndexError):
        return None
    return None


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG markers to the first SOFn frame header."""
    i = 2
    n = len(b)
    while i + 9 < n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return int(w), int(h)
        i += 2 + seg_len
    return None


# ---------------------------------------------------------------------------
# BMP: full decode / encode / resize (uncompressed 24bpp)
# ---------------------------------------------------------------------------

_BMP_HEADER = 54  # BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40)


def make_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Valid bottom-up 24bpp BMP from a raw BGR pixel buffer
    (len == width*height*3, row order top-to-bottom for caller sanity —
    encoded bottom-up as BMP requires, rows padded to 4 bytes)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    rows = [
        pixels[y * row_raw : (y + 1) * row_raw] + b"\x00" * pad
        for y in range(height - 1, -1, -1)
    ]
    body = b"".join(rows)
    size = _BMP_HEADER + len(body)
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body


def bmp_pixels(payload: bytes) -> tuple[int, int, bytes] | None:
    """(width, height, top-to-bottom BGR buffer) from an uncompressed
    24bpp BMP, or None if not decodable."""
    if sniff_format(payload) != "bmp":
        return None
    try:
        offset = struct.unpack("<I", payload[10:14])[0]
        w, h = struct.unpack("<ii", payload[18:26])
        bpp = struct.unpack("<H", payload[28:30])[0]
        compression = struct.unpack("<I", payload[30:34])[0]
    except struct.error:
        return None
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    row_raw = w * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    if len(payload) < offset + stride * h:
        return None
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        start = offset + y * stride
        rows.append(payload[start : start + row_raw])
    return w, h, b"".join(rows)


def bmp_resize(payload: bytes, tw: int, th: int) -> bytes | None:
    """Back-compat name: nearest-neighbor resize via image_resize (which
    also accepts 8-bit PNG input; output is always BMP)."""
    return image_resize(payload, tw, th)


# ---------------------------------------------------------------------------
# PNG: full decode / encode (8-bit gray / RGB / RGBA, stdlib zlib)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def make_png(width: int, height: int, pixels: bytes) -> bytes:
    """Valid 8-bit RGB PNG from a raw BGR pixel buffer (len == w*h*3,
    top-to-bottom) — filter 0 rows, one zlib IDAT."""
    import zlib

    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    stride = width * 3
    for y in range(height):
        raw.append(0)  # filter type 0
        row = pixels[y * stride : (y + 1) * stride]
        for x in range(0, stride, 3):  # BGR -> RGB
            raw += bytes((row[x + 2], row[x + 1], row[x]))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_pixels(payload: bytes) -> tuple[int, int, bytes] | None:
    """(width, height, top-to-bottom BGR buffer) from an 8-bit
    non-interlaced gray/RGB/RGBA PNG — REAL pixel decode: chunk walk,
    zlib inflate, per-row unfilter (types 0-4 incl. Paeth). Returns
    None for palette/16-bit/interlaced images or corrupt streams."""
    import zlib

    if sniff_format(payload) != "png":
        return None
    try:
        w, h = struct.unpack(">II", payload[16:24])
        bit_depth, color_type, _, _, interlace = struct.unpack(
            "BBBBB", payload[24:29]
        )
        if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
            return None
        # walk chunks, concatenating IDAT
        idat = bytearray()
        i = 8
        while i + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[i : i + 4])
            typ = payload[i + 4 : i + 8]
            if typ == b"IDAT":
                idat += payload[i + 8 : i + 8 + length]
            if typ == b"IEND":
                break
            i += 12 + length
        ch = _PNG_CHANNELS[color_type]
        raw = zlib.decompress(bytes(idat))
        stride = w * ch
        if len(raw) != h * (stride + 1):
            return None
        out = bytearray(h * stride)
        prev = bytes(stride)
        for y in range(h):
            f = raw[y * (stride + 1)]
            line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
            if f == 1:  # Sub
                for x in range(ch, stride):
                    line[x] = (line[x] + line[x - ch]) & 0xFF
            elif f == 2:  # Up
                for x in range(stride):
                    line[x] = (line[x] + prev[x]) & 0xFF
            elif f == 3:  # Average
                for x in range(stride):
                    left = line[x - ch] if x >= ch else 0
                    line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for x in range(stride):
                    left = line[x - ch] if x >= ch else 0
                    ul = prev[x - ch] if x >= ch else 0
                    line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
            elif f != 0:
                return None
            out[y * stride : (y + 1) * stride] = line
            prev = bytes(line)
    except (struct.error, zlib.error, IndexError):
        return None
    # normalize to 3-channel BGR
    bgr = bytearray(w * h * 3)
    for p in range(w * h):
        if ch == 1:
            v = out[p]
            bgr[p * 3 : p * 3 + 3] = bytes((v, v, v))
        else:
            r, g, b = out[p * ch], out[p * ch + 1], out[p * ch + 2]
            bgr[p * 3 : p * 3 + 3] = bytes((b, g, r))
    return int(w), int(h), bytes(bgr)


# ---------------------------------------------------------------------------
# GIF: full first-frame pixel decode (pure-stdlib LZW) + tiny encoder
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> bytes | None:
    """GIF-variant LZW: variable code width (LSB-first bit packing),
    CLEAR/END control codes, table growth to 12 bits. Returns the index
    stream, or None on a corrupt code sequence."""
    clear = 1 << min_code_size
    end = clear + 1
    stream = int.from_bytes(data, "little")
    total_bits = len(data) * 8
    bitpos = 0

    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while bitpos + code_size <= total_bits:
        code = (stream >> bitpos) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == end:
            break
        if code == clear:
            code_size = min_code_size + 1
            del table[clear + 2 :]
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK deferred-code case
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Matching GIF-LZW encoder (used by make_gif, so decoder tests
    exercise real table growth, not a degenerate clear-per-code
    stream)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for c in indices:
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4097:  # table full: reset (rare in tests)
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = wc[-1:]
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(width: int, height: int, pixels: bytes) -> bytes:
    """Valid GIF89a from a raw BGR pixel buffer (len == w*h*3,
    top-to-bottom): palette built from the distinct colors (<= 256),
    REAL LZW-compressed image data."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    colors: dict[bytes, int] = {}
    indices = bytearray()
    for p in range(width * height):
        c = pixels[p * 3 : p * 3 + 3]
        if c not in colors:
            if len(colors) == 256:
                raise ValueError("more than 256 distinct colors")
            colors[c] = len(colors)
        indices.append(colors[c])
    # palette size = next power of two >= len(colors), min 2
    bits = max(2, (len(colors) - 1).bit_length() or 1)
    palette = bytearray()
    for c in colors:  # insertion order == index order; BGR -> RGB
        palette += bytes((c[2], c[1], c[0]))
    palette += b"\x00" * ((1 << bits) * 3 - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF0 | (bits - 1), 0, 0)
    out += palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)  # no LCT
    mcs = max(2, bits)
    out.append(mcs)
    lzw = _lzw_encode(bytes(indices), mcs)
    for i in range(0, len(lzw), 255):  # sub-block framing
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_pixels(payload: bytes) -> tuple[int, int, bytes] | None:
    """(width, height, top-to-bottom BGR buffer) of the FIRST frame,
    composed onto the logical screen (background-filled when the frame
    is smaller) — REAL pixel decode: block walk, sub-block reassembly,
    LZW inflate, optional de-interlace, palette mapping. Returns None
    for corrupt streams or a missing color table."""
    if sniff_format(payload) != "gif":
        return None
    try:
        sw, sh, packed, bg, _ = struct.unpack("<HHBBB", payload[6:13])
        i = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = payload[i : i + n * 3]
            i += n * 3
        # walk blocks to the first image descriptor
        while i < len(payload):
            b = payload[i]
            if b == 0x21:  # extension: label + sub-blocks
                i += 2
                while i < len(payload) and payload[i] != 0:
                    i += payload[i] + 1
                i += 1
            elif b == 0x2C:
                break
            else:  # trailer (0x3B) or junk before any image
                return None
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
        i += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = payload[i : i + n * 3]
            i += n * 3
        if ct is None or w == 0 or h == 0:
            return None
        mcs = payload[i]
        i += 1
        lzw = bytearray()
        while i < len(payload) and payload[i] != 0:
            n = payload[i]
            lzw += payload[i + 1 : i + 1 + n]
            i += 1 + n
        indices = _lzw_decode(bytes(lzw), mcs)
        if indices is None or len(indices) < w * h:
            return None
        if ipacked & 0x40:  # de-interlace
            deinter = bytearray(w * h)
            src = 0
            for start, stepping in _GIF_INTERLACE_PASSES:
                for y in range(start, h, stepping):
                    deinter[y * w : (y + 1) * w] = indices[src : src + w]
                    src += w
            indices = bytes(deinter)
        n_colors = len(ct) // 3
        bg_rgb = (
            ct[bg * 3 : bg * 3 + 3] if gct is not None and bg < n_colors else b"\x00\x00\x00"
        )
        bgr = bytearray(bytes((bg_rgb[2], bg_rgb[1], bg_rgb[0])) * (sw * sh))
        for y in range(min(h, sh - top)):
            for x in range(min(w, sw - left)):
                idx = indices[y * w + x]
                if idx >= n_colors:
                    return None
                p = ((top + y) * sw + (left + x)) * 3
                bgr[p] = ct[idx * 3 + 2]
                bgr[p + 1] = ct[idx * 3 + 1]
                bgr[p + 2] = ct[idx * 3]
    except (struct.error, IndexError):
        return None
    return int(sw), int(sh), bytes(bgr)


def image_pixels(payload: bytes) -> tuple[int, int, bytes] | None:
    """Pixel decode for any supported format (24bpp BMP, 8-bit PNG, GIF
    first frame via pure-stdlib LZW, baseline JPEG via functions/jpeg.py)."""
    if sniff_format(payload) == "jpeg":
        from blarify_spark.functions.jpeg import jpeg_pixels

        return jpeg_pixels(payload)
    return bmp_pixels(payload) or png_pixels(payload) or gif_pixels(payload)


def image_resize(payload: bytes, tw: int, th: int) -> bytes | None:
    """REAL nearest-neighbor resize of any pixel-decodable image
    (decode → resample → re-encode); output container is always BMP,
    the canonical uncompressed interchange here."""
    import numpy as np

    decoded = image_pixels(payload)
    if decoded is None:
        return None
    w, h, buf = decoded
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return make_bmp(tw, th, arr[ys][:, xs].tobytes())


# ---------------------------------------------------------------------------
# WAV (stdlib wave + audioop)
# ---------------------------------------------------------------------------


def make_wav(
    n_frames: int, rate: int = 8000, seed: int = 0, channels: int = 1
) -> bytes:
    """Deterministic 16-bit PCM WAV (a ramp wave seeded by `seed`)."""
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = bytearray()
        for i in range(n_frames * channels):
            val = ((i * 257 + seed * 7919) % 20000) - 10000
            samples += struct.pack("<h", val)
        w.writeframes(bytes(samples))
    return bio.getvalue()


def wav_info(payload: bytes) -> dict | None:
    """Real PCM decode: channels, sample rate, frame count, duration,
    RMS energy of the actual samples."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n = w.getnframes()
            rate = w.getframerate()
            width = w.getsampwidth()
            channels = w.getnchannels()
            frames = w.readframes(n)
    except (wave.Error, EOFError):
        return None
    rms = _rms(frames, width) if frames else 0
    return {
        "channels": channels,
        "rate": rate,
        "n_frames": n,
        "duration_ms": int(n * 1000 / rate) if rate else 0,
        "rms": rms,
    }


# ---------------------------------------------------------------------------
# RVID toy video container (documented stand-in, see module docstring)
# ---------------------------------------------------------------------------

_RVID_HDR = struct.Struct("<4sHHI")


def make_rvid(width: int, height: int, frames: list[bytes]) -> bytes:
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size mismatch")
    return _RVID_HDR.pack(b"RVID", width, height, len(frames)) + b"".join(
        frames
    )


def rvid_info(payload: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_frames) — the header is validated against the
    actual payload length, so truncated blobs fail to decode."""
    if len(payload) < _RVID_HDR.size:
        return None
    magic, w, h, n = _RVID_HDR.unpack_from(payload)
    if magic != b"RVID" or w <= 0 or h <= 0:
        return None
    if len(payload) != _RVID_HDR.size + w * h * n:
        return None
    return int(w), int(h), int(n)


def rvid_frame(payload: bytes, idx: int) -> bytes | None:
    info = rvid_info(payload)
    if info is None or not 0 <= idx < info[2]:
        return None
    w, h, _ = info
    start = _RVID_HDR.size + idx * w * h
    return payload[start : start + w * h]
