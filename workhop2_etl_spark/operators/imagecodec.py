"""Real image codec kernels for the multimodal operators.

Three tiers, best available wins, all pure functions of the payload:

1. **PIL**, when installed (import-tried; not in this container) —
   any format, real resampling.
2. **Stdlib PNG codec** (zlib + struct + numpy): full decode of
   non-interlaced 8-bit gray/RGB/RGBA PNGs, nearest-neighbor resize,
   re-encode. PNG's format is public and simple enough that the
   whole codec is ~80 lines — so "decode actual image bytes" does
   not have to wait for codec libraries.
3. **Header-only dimension probes** for PNG / JPEG / GIF / BMP
   (struct over the public container layouts — what the `imagesize`
   library does): real width/height/channels without decoding
   pixels, which is all the metadata stage needs.

Anything unrecognized falls back to the deterministic stubs in
operators/multimodal.py, keeping text-bytes fixtures (and their
oracles) working unchanged.
"""

from __future__ import annotations

import struct
import zlib

try:  # optional; absent in this container
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type → channel count
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def probe_dims(payload: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from container headers alone, or
    None when the payload is not a recognized image format."""
    if payload is None or len(payload) < 10:
        return None
    b = bytes(payload)
    if b.startswith(_PNG_SIG) and len(b) >= 29 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        channels = _PNG_CHANNELS.get(b[25])
        if channels is None:
            return None
        return (w, h, channels)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return (w, h, 3)  # palette expands to RGB
    if b.startswith(b"BM") and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return (w, abs(h), 3)
    if b.startswith(b"\xff\xd8"):
        return _jpeg_dims(b)
    return None


#: JPEG start-of-frame markers that carry dimensions (all SOFn except
#: DHT/DAC/restart markers which reuse the C-range).
_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg_dims(b: bytes) -> tuple[int, int, int] | None:
    i = 2
    n = len(b)
    while i + 9 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if marker in _SOF:
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return (w, h, b[i + 9])
        i += 2 + seg_len
    return None


# ---------------------------------------------------------------------------
# Stdlib PNG decode / encode (non-interlaced, 8-bit depth)
# ---------------------------------------------------------------------------


def png_decode(payload: bytes):
    """Decode an 8-bit non-interlaced gray/RGB/RGBA PNG to an
    (h, w, channels) uint8 numpy array; None when the payload is not
    such a PNG. Unfiltering follows the PNG spec (filters 0-4)."""
    import numpy as np

    b = bytes(payload or b"")
    if not b.startswith(_PNG_SIG):
        return None
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(b):
        (length,), ctype = struct.unpack(">I", b[pos : pos + 4]), b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                return None
            meta = (w, h, _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if meta is None or not idat:
        return None
    w, h, ch = meta
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, np.uint8, stride, row_start + 1).copy()
        if ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            line = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                bb = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            return None
        out[y] = line
        prev = line
    return out.reshape(h, w, ch)


def png_encode(arr) -> bytes:
    """Encode an (h, w, channels∈{1,3,4}) uint8 array as a PNG
    (filter 0 rows — valid, if not maximally compressed)."""
    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_real(payload: bytes, width: int, height: int) -> bytes | None:
    """Real resize when a real decoder can handle the payload:
    PIL if installed (any format, bilinear), else the stdlib PNG
    codec (nearest-neighbor). None → caller falls back to the stub."""
    import numpy as np

    if payload is None:
        return None
    b = bytes(payload)
    if HAVE_PIL:
        import io

        try:
            with Image.open(io.BytesIO(b)) as im:
                out = io.BytesIO()
                im.resize((width, height)).save(out, format=im.format or "PNG")
                return out.getvalue()
        except Exception:
            return None
    arr = png_decode(b)
    if arr is None:
        return None
    h_in, w_in, _ = arr.shape
    ys = np.minimum((np.arange(height) * h_in) // height, h_in - 1)
    xs = np.minimum((np.arange(width) * w_in) // width, w_in - 1)
    return png_encode(arr[ys][:, xs])


# ---------------------------------------------------------------------------
# GIF container codec (animated GIF as the "video" fixture format)
# ---------------------------------------------------------------------------
#
# The frame-sampling stage needs a real multi-frame container to prove
# itself on. Animated GIF is the one video-ish format whose layout is
# simple enough for a dependency-free codec: `gif_frames` walks the
# public block structure (GIF89a spec: logical screen descriptor,
# graphic-control extensions, image descriptors, sub-block chains) and
# returns every frame's descriptor + timing without decoding pixels;
# `gif_encode` writes a GENUINE animated GIF — the LZW bitstream is
# real (literal-coded with correct decoder-table width growth and
# periodic clear codes), so any standard viewer renders the output.


def _lzw_solid(n_pixels: int, color_idx: int, min_code: int = 2) -> bytes:
    """Valid GIF-LZW stream for ``n_pixels`` of one color index.
    All-literal coding: the decoder adds one table entry per code
    after each clear, so the encoder mirrors that growth to time its
    code-width increments, clearing before the table can overflow."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    next_code = eoi + 1
    emit(clear, width)
    first = True
    for _ in range(n_pixels):
        emit(color_idx, width)
        if first:
            first = False
        else:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
            if next_code >= 4093:
                emit(clear, width)
                width = min_code + 1
                next_code = eoi + 1
                first = True
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(
    frames: list[tuple[int, int, int, int, int]],
    screen_w: int,
    screen_h: int,
) -> bytes:
    """Animated GIF89a from ``(width, height, left, top, delay_cs)``
    frame specs; frame i is a solid block of palette color i % 4."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", screen_w, screen_h)
    out += bytes([0x80 | 0x01, 0x00, 0x00])  # 4-entry GCT, bg 0
    out += bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])  # GCT
    for i, (w, h, left, top, delay_cs) in enumerate(frames):
        out += bytes([0x21, 0xF9, 0x04, 0x00])  # GCE
        out += struct.pack("<H", delay_cs)
        out += bytes([0x00, 0x00])  # transparent idx, terminator
        out += bytes([0x2C]) + struct.pack("<HHHH", left, top, w, h)
        out += bytes([0x00])  # no LCT, not interlaced
        out += bytes([0x02])  # LZW min code size
        data = _lzw_solid(w * h, i % 4)
        for off in range(0, len(data), 255):
            block = data[off : off + 255]
            out += bytes([len(block)]) + block
        out += bytes([0x00])  # end of image data
    out += bytes([0x3B])
    return bytes(out)


def gif_frames(payload: bytes) -> list[dict] | None:
    """Container walk: one dict per frame —
    ``{idx, left, top, width, height, delay_cs}`` (delay from the
    preceding graphic-control extension, 0 if none) — or None when
    the payload is not a GIF / is truncated mid-structure."""
    if payload is None:
        return None
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    pos = 6
    pos += 4  # screen w/h
    packed = b[pos]
    pos += 3
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))  # global color table
    frames: list[dict] = []
    delay_cs = 0
    try:
        while True:
            marker = b[pos]
            pos += 1
            if marker == 0x3B:  # trailer
                break
            if marker == 0x21:  # extension
                label = b[pos]
                pos += 1
                if label == 0xF9:  # graphic control
                    size = b[pos]
                    if size >= 4:
                        delay_cs = struct.unpack(
                            "<H", b[pos + 2 : pos + 4]
                        )[0]
                # skip this extension's sub-blocks (incl. the GCE's)
                while True:
                    n = b[pos]
                    pos += 1
                    if n == 0:
                        break
                    pos += n
            elif marker == 0x2C:  # image descriptor
                left, top, w, h = struct.unpack("<HHHH", b[pos : pos + 8])
                pos += 8
                ipacked = b[pos]
                pos += 1
                if ipacked & 0x80:
                    pos += 3 * (2 << (ipacked & 0x07))  # local color table
                pos += 1  # LZW min code size
                while True:  # image data sub-blocks
                    n = b[pos]
                    pos += 1
                    if n == 0:
                        break
                    pos += n
                frames.append(
                    {
                        "idx": len(frames),
                        "left": left,
                        "top": top,
                        "width": w,
                        "height": h,
                        "delay_cs": delay_cs,
                    }
                )
                delay_cs = 0
            else:
                return None  # unknown block: not a well-formed GIF
    except (IndexError, struct.error):
        return None  # truncated
    return frames or None


def decode_array(payload: bytes):
    """Best-tier pixel decode to an (h, w, channels) uint8 array:
    PIL when installed (any format), else the stdlib PNG codec; None
    when no tier can decode the payload."""
    return decode_array_tiered(payload)[0]


def decode_array_tiered(payload: bytes):
    """(array, tier) pixel decode — like ``decode_array`` but also
    names WHICH tier produced the pixels: ``'pil'`` (any format PIL
    knows, including JPEG), ``'stdlib-png'`` (the pure-stdlib PNG
    codec), or ``'none'`` with a None array when no tier can decode.
    Downstream feature extractors carry the tier so a corpus
    datasheet can account for silently-undecodable payloads (e.g.
    JPEG bytes on a PIL-less cluster) instead of them vanishing into
    NULL features."""
    if HAVE_PIL:
        import io

        import numpy as np

        try:
            with Image.open(io.BytesIO(bytes(payload or b""))) as im:
                arr = np.asarray(im.convert("RGB" if im.mode not in ("L", "RGB", "RGBA") else im.mode))
                return (arr[:, :, None] if arr.ndim == 2 else arr), "pil"
        except Exception:
            pass  # fall through to the stdlib tier
    arr = png_decode(payload)
    return arr, ("stdlib-png" if arr is not None else "none")
