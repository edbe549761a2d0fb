"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the DataFrame carries either
the bytes themselves (small assets) or a pointer struct (uri, offset,
length) into blob storage; decode / feature-extraction runs as
Arrow-batched pandas functions over ``mapInPandas`` so each task touches
one batch of payloads at a time and nothing ever lands on the driver.

Five real codecs ARE implemented dependency-free:

- 24-bit uncompressed BMP (encode + decode in pure numpy/struct —
  BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows, 4-byte row
  padding);
- 8-bit truecolor PNG (stdlib zlib + struct — chunk framing with CRC
  verification, IDAT deflate, a full scanline unfilter supporting
  all five PNG filter types, and Adam7 interlacing (seven
  independently-filtered passes), so third-party-encoded truecolor
  PNGs decode too, not just our own filter-0 output);
- palette GIF89a (pure stdlib/numpy — logical screen descriptor,
  global/local color tables, extension skipping, sub-block
  reassembly, and a full GIF-variant LZW encoder/decoder with
  variable code width, CLEAR-code resets, and the KwKwK case);
- baseline JFIF JPEG (operators/jpeg.py — forward/inverse DCT,
  Annex-K quantization + Huffman tables, 4:4:4 and 4:2:0 chroma,
  restart markers; validated against third-party-encoded JPEGs),
  the format real training corpora are overwhelmingly made of;
- PCM WAV (stdlib ``wave`` — RIFF container; 8/16/24/32-bit
  widths, mono or interleaved multi-channel, 24-bit sign-extended
  manually), covering the audio modality.

So the ``use_codec=True`` path runs a genuine bytes -> pixels decode
end-to-end for the image container formats, and
:func:`extract_audio_features` a genuine bytes -> samples decode for
audio. The VIDEO modality is closed natively too (round 14): a real
MJPEG-in-AVI container — RIFF chunk walk, avih/strh/strf headers,
idx1 index — over the from-scratch JPEG codec
(:func:`encode_avi_mjpeg` / :func:`decode_avi_frames`), feeding the
existing frame-sampling path. Formats that need external libraries
(MP3, WebP, inter-frame-coded video like H.264/MP4) still raise
NotImplementedError behind the clearly-marked seam; swapping in
PIL / torchaudio / pyav later changes only ``_decode_pixels`` /
``decode_wav``'s dispatch.
"""

from __future__ import annotations

import io
import re
import struct
import wave
import zlib
from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stockpy_spark.operators.spread import spread_small_input

# metadata struct carried alongside every binary payload
ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_sum_mod", T.LongType()),
        T.StructField("media_type", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a binary asset column + typed metadata from text (stand-in
    for real image bytes; the schema/partitioning is what matters).
    Deterministic fake dims derived from the id."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.col(id_col) % 64 + 16).cast("int").alias("width"),
            (F.col(id_col) % 48 + 16).cast("int").alias("height"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows padded to
    4 bytes). Pure struct/numpy — no image library."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) // 4 * 4
    data_size = row_size * h
    padded = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up row order, RGB -> BGR channel order
    padded[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + info + padded.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB
    array. Raises ValueError on malformed input."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    _hdr, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    if h < 0:  # negative height = top-down rows (rare but legal)
        h, top_down = -h, True
    else:
        top_down = False
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, np.uint8, row_size * h, offset).reshape(h, row_size)
    px = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_pass_dims(h: int, w: int, p: int) -> tuple[int, int]:
    x0, y0, dx, dy = _ADAM7[p]
    return max(0, -(-(h - y0) // dy)), max(0, -(-(w - x0) // dx))


def encode_png(
    pixels: np.ndarray, compress_level: int = 6, interlace: bool = False
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (color type 2, filter 0 scanlines). Stdlib zlib + struct only — no
    image library. ``interlace=True`` writes the seven Adam7 passes
    (each pass its own run of filtered scanlines over the pass
    sub-image, empty passes omitted, per spec)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
            sub = pixels[y0::dy, x0::dx]
            hp, wp = sub.shape[0], sub.shape[1]
            if hp == 0 or wp == 0:
                continue
            rows = np.zeros((hp, wp * 3 + 1), dtype=np.uint8)
            rows[:, 1:] = sub.reshape(hp, wp * 3)
            parts.append(rows.tobytes())
        payload = b"".join(parts)
    else:
        rows = np.zeros((h, w * 3 + 1), dtype=np.uint8)  # filter byte 0
        rows[:, 1:] = pixels.reshape(h, w * 3)
        payload = rows.tobytes()
    idat = zlib.compress(payload, compress_level)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor (color type 2) PNG into an (h, w, 3)
    uint8 RGB array — non-interlaced or Adam7. Verifies chunk CRCs,
    concatenates multiple IDAT chunks, and unfilters all five scanline
    filter types (None/Sub/Up/Average/Paeth) per pass. Raises
    ValueError on malformed or unsupported input."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, idat, dims = 8, [], None
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt) != (8, 2, 0, 0) or interlace > 1:
                raise ValueError(
                    "unsupported PNG variant (need 8-bit truecolor, "
                    f"got depth={depth} color={color} interlace={interlace})"
                )
            dims = (h, w, interlace)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if dims is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    h, w, interlace = dims
    raw = zlib.decompress(b"".join(idat))
    if not interlace:
        if len(raw) != h * (w * 3 + 1):
            raise ValueError("PNG scanline data has wrong length")
        return _png_unfilter(raw, 0, h, w).reshape(h, w, 3)
    # Adam7: seven independently-filtered sub-images (each pass's
    # filters reference that pass's own previous scanline), scattered
    # back onto the canvas by the pass grid; empty passes are absent
    # from the stream per spec
    out = np.empty((h, w, 3), dtype=np.uint8)
    off = 0
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
        hp, wp = _adam7_pass_dims(h, w, p)
        if hp == 0 or wp == 0:
            continue
        sub = _png_unfilter(raw, off, hp, wp).reshape(hp, wp, 3)
        out[y0::dy, x0::dx] = sub
        off += hp * (wp * 3 + 1)
    if off != len(raw):
        raise ValueError("PNG interlaced scanline data has wrong length")
    return out


def _png_unfilter(raw: bytes, off: int, h: int, w: int) -> np.ndarray:
    """Unfilter ``h`` scanlines of ``w`` RGB pixels starting at byte
    ``off`` (each line = 1 filter byte + w*3 data bytes), supporting
    all five filter types. Per-pixel recurrences run in small Python
    loops — fine at asset-thumbnail sizes; a production hot path swaps
    in a C codec at the same dispatch seam."""
    stride = w * 3
    if off + h * (stride + 1) > len(raw):
        raise ValueError("PNG scanline data has wrong length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        base = off + y * (stride + 1)
        f = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth recurrences (bpp = 3)
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                if f == 1:
                    v = line[x] + a
                elif f == 3:
                    v = line[x] + (a + b) // 2
                elif f == 4:
                    v = line[x] + _paeth(a, b, c)
                else:
                    raise ValueError(f"bad PNG filter byte {f}")
                cur[x] = v & 0xFF
        out[y] = cur
        prev = cur.astype(np.int32)
    return out


def _lzw_encode_gif(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW over a palette-index stream: variable code width
    starting at ``min_code_size + 1`` bits, LSB-first bit packing, CLEAR
    emitted up front and again whenever the 12-bit table fills.

    r16: the bit accumulator is inlined (the emit closure was one call
    per emitted code — ~15% of GIF encode CPU on the tiny fixture
    frames) and the numpy index stream is converted once via
    ``tolist()`` instead of boxing one np scalar per pixel. Output
    bytes are identical (pinned by the GIF parity sweep recorded in
    OPTIMIZATION_r16.md)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nacc = 0
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    # emit(clear, width)
    acc |= clear << nacc
    nacc += width
    while nacc >= 8:
        out.append(acc & 0xFF)
        acc >>= 8
        nacc -= 8
    cur = -1
    seq = indices.tolist() if hasattr(indices, "tolist") else indices
    for sym in seq:
        if cur < 0:
            cur = sym
            continue
        key = (cur, sym)
        if key in table:
            cur = table[key]
            continue
        # emit(cur, width)
        acc |= cur << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
        table[key] = next_code
        next_code += 1
        # widen AFTER the add so the next emitted code (which may be the
        # just-added one, the KwKwK case) fits; mirrors the decoder's
        # ``next_code == 1 << width`` rule one add earlier
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:  # 12-bit table full: reset, like real encoders
            acc |= clear << nacc
            nacc += width
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        cur = sym
    if cur >= 0:
        acc |= cur << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    acc |= eoi << nacc
    nacc += width
    while nacc >= 8:
        out.append(acc & 0xFF)
        acc >>= 8
        nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


@lru_cache(maxsize=16)
def _lzw_base_table(clear: int) -> tuple:
    """The initial LZW string table for a given CLEAR code, cached —
    the decoder rebuilt this ``clear + 2``-entry list on every CLEAR
    (once per frame minimum), ~18% of GIF decode CPU at fixture frame
    sizes (r16 profile). Returned as a tuple so the cache entry stays
    immutable; callers materialize their mutable copy with list()."""
    return tuple([bytes([i]) for i in range(clear)] + [None, None])


def _lzw_decode_gif(data: bytes, min_code_size: int) -> list[int]:
    """Inverse of :func:`_lzw_encode_gif`; raises ValueError on a code
    stream that references an undefined table entry."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes | None] = list(_lzw_base_table(clear))
    out: list[int] = []
    prev: bytes | None = None
    acc = nacc = pos = 0
    dlen = len(data)
    while True:
        while nacc < width:
            if pos >= dlen:
                return out  # tolerant of streams that omit EOI
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table = list(_lzw_base_table(clear))
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK: code not yet in table
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _palette_unique(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """``np.unique(rows, axis=0, return_inverse=True)`` for (n, 3)
    uint8 RGB rows, via a packed uint32 key. The axis-unique path
    (void-view sort + moveaxis machinery) was ~33% of the whole GIF
    codec CPU at fixture frame sizes (r16 profile); the scalar unique
    is ~6x cheaper. Packing r<<16 | g<<8 | b sorts identically to the
    row-lexicographic order axis-unique uses, so colors AND inverse
    are element-identical (pinned by the GIF parity sweep in
    OPTIMIZATION_r16.md)."""
    r32 = rows.astype(np.uint32)
    packed = (r32[:, 0] << 16) | (r32[:, 1] << 8) | r32[:, 2]
    upacked, inverse = np.unique(packed, return_inverse=True)
    colors = np.empty((upacked.shape[0], 3), dtype=np.uint8)
    colors[:, 0] = upacked >> 16
    colors[:, 1] = (upacked >> 8) & 0xFF
    colors[:, 2] = upacked & 0xFF
    return colors, inverse


GIF_SIGNATURES = (b"GIF87a", b"GIF89a")


def _gif_interlace_order(h: int) -> np.ndarray:
    """Row order of an interlaced GIF index stream (GIF89a appendix E):
    pass 1 every 8th row from 0, pass 2 every 8th from 4, pass 3 every
    4th from 2, pass 4 every 2nd from 1. ``order[i]`` is the CANVAS row
    the i-th STREAM row lands on, so ``canvas[order] = stream`` is the
    whole de-interlace and ``stream = canvas[order]`` the interlace."""
    return np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a GIF89a with a global
    color table and a real LZW-compressed index stream (stdlib/numpy
    only). Requires <= 256 distinct colors — GIF is palette-based; a
    richer image needs quantization first, which is a modeling choice
    the caller must make, so we raise instead of silently degrading.
    ``interlace=True`` writes the four-pass interlaced row order with
    the image-descriptor flag set."""
    h, w, _ = pixels.shape
    colors, inverse = _palette_unique(pixels.reshape(-1, 3))
    n = len(colors)
    if n > 256:
        raise ValueError(f"GIF needs a <=256-color palette, image has {n}")
    bits = max(1, (n - 1).bit_length())  # palette index width, 1..8
    gct = np.zeros((1 << bits, 3), dtype=np.uint8)
    gct[:n] = colors
    packed = 0x80 | ((bits - 1) << 4) | (bits - 1)  # GCT present, size 2^bits
    lsd = struct.pack("<HHBBB", w, h, packed, 0, 0)
    ipacked = 0x40 if interlace else 0
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipacked)
    mcs = max(2, bits)  # spec minimum LZW code size is 2
    if interlace:
        inverse = inverse.reshape(h, w)[_gif_interlace_order(h)].reshape(-1)
    lzw = _lzw_encode_gif(inverse, mcs)
    blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF89a" + lsd + gct.tobytes() + img_desc + bytes([mcs]) + blocks
        + b"\x00\x3b"
    )


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode a single-frame GIF into an (h, w, 3) uint8 RGB array:
    logical screen descriptor, global/local color table, extension-
    block skipping, sub-block reassembly, LZW expansion, four-pass
    de-interlacing when the image-descriptor flag is set. Raises
    ValueError on malformed input."""
    if payload[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF payload")
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks until 0 terminator
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            palette = gct
            if ipacked & 0x80:  # local color table overrides
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if palette is None:
                raise ValueError("GIF image has no color table")
            mcs = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                size = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + size])
                pos += 1 + size
            idx = _lzw_decode_gif(b"".join(chunks), mcs)
            if len(idx) < h * w:
                raise ValueError("GIF index stream shorter than image")
            rect = palette[np.asarray(idx[: h * w], dtype=np.int64)].reshape(h, w, 3)
            if ipacked & 0x40:
                out = np.empty_like(rect)
                out[_gif_interlace_order(h)] = rect
                rect = out
            return rect
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def encode_gif_animated(
    frames: list[np.ndarray],
    transparent_masks: list[np.ndarray | None] | None = None,
    disposals: list[int] | None = None,
) -> bytes:
    """Encode a list of same-screen-size (h, w, 3) uint8 RGB frames as
    an animated GIF89a: Netscape 2.0 looping extension, one graphic
    control extension + image descriptor + LOCAL color table + LZW
    index stream per frame. Local palettes (not one global) because
    each frame may use up to 256 distinct colors of its own — the
    union across frames can exceed the global table limit.

    ``transparent_masks[f]`` is an optional (h, w) bool array marking
    pixels of frame f as TRANSPARENT (a dedicated palette entry is
    appended and flagged in that frame's GCE; the pixel's RGB value in
    ``frames[f]`` is ignored at those positions). ``disposals[f]`` is
    the frame's GCE disposal method (default 1 = do not dispose; 2 =
    restore rect to background; 3 = restore to previous canvas).
    Opaque colors + the transparent slot must fit 256 entries."""
    if not frames:
        raise ValueError("animated GIF needs at least one frame")
    h, w, _ = frames[0].shape
    for fr in frames:
        if fr.shape != (h, w, 3):
            raise ValueError("all animation frames must share the screen size")
    if transparent_masks is None:
        transparent_masks = [None] * len(frames)
    if disposals is None:
        disposals = [1] * len(frames)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0, 0, 0)  # no GCT
    # Netscape looping application extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr, mask, disposal in zip(frames, transparent_masks, disposals):
        colors, inverse = _palette_unique(fr.reshape(-1, 3))
        n = len(colors)
        trans_idx = None
        if mask is not None and mask.any():
            trans_idx = n  # dedicated slot after the opaque colors
            inverse = inverse.copy()
            inverse[mask.reshape(-1)] = trans_idx
            n += 1
        if n > 256:
            raise ValueError(f"GIF frame needs <=256 palette slots, has {n}")
        bits = max(1, (n - 1).bit_length())
        lct = np.zeros((1 << bits, 3), dtype=np.uint8)
        lct[: len(colors)] = colors
        gce_packed = ((disposal & 0x07) << 2) | (
            0x01 if trans_idx is not None else 0x00
        )
        out += b"\x21\xf9\x04" + bytes([gce_packed]) + struct.pack("<H", 10)
        out += bytes([trans_idx or 0, 0x00])
        ipacked = 0x80 | (bits - 1)  # LCT present, size 2^bits
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipacked)
        out += lct.tobytes()
        mcs = max(2, bits)
        lzw = _lzw_encode_gif(inverse, mcs)
        out += bytes([mcs])
        out += b"".join(
            bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
            for i in range(0, len(lzw), 255)
        )
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode EVERY frame of a (possibly animated) GIF, compositing
    each image rect onto the logical screen per the disposal rules:
    returns a list of (screen_h, screen_w, 3) uint8 arrays, one fully
    rendered canvas per frame. Handles the full GIF89a compositing
    model: disposal 0/1 (leave canvas), 2 (restore rect to background
    = black), 3 (restore rect to the canvas as it was BEFORE this
    frame rendered), and GCE transparency (pixels at the flagged
    palette index are not drawn — the prior canvas shows through),
    and four-pass interlaced index streams. Single-frame
    GIFs return a 1-element list, so this is a strict superset of
    :func:`decode_gif`."""
    if payload[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    disposal = 0
    trans_idx = None
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:
            label = payload[pos + 1]
            if label == 0xF9:  # graphic control extension
                gce_packed = payload[pos + 3]
                disposal = (gce_packed >> 2) & 0x07
                trans_idx = (
                    payload[pos + 6] if gce_packed & 0x01 else None
                )
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:
            left, top, w, h, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            palette = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    payload, np.uint8, n * 3, pos
                ).reshape(n, 3)
                pos += n * 3
            if palette is None:
                raise ValueError("GIF image has no color table")
            mcs = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                size = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + size])
                pos += 1 + size
            pos += 1
            idx = _lzw_decode_gif(b"".join(chunks), mcs)
            if len(idx) < h * w:
                raise ValueError("GIF index stream shorter than image")
            idx_arr = np.asarray(idx[: h * w], dtype=np.int64).reshape(h, w)
            if ipacked & 0x40:  # four-pass interlaced row order
                tmp = np.empty_like(idx_arr)
                tmp[_gif_interlace_order(h)] = idx_arr
                idx_arr = tmp
            region = canvas[top : top + h, left : left + w]
            # disposal 3 restores the canvas as it was BEFORE this
            # frame rendered — snapshot the rect before compositing
            prev = region.copy() if disposal == 3 else None
            if trans_idx is not None:
                # transparent pixels are not drawn: prior canvas shows
                opaque = (idx_arr != trans_idx)[:, :, None]
                rect = np.where(opaque, palette[idx_arr], region)
            else:
                rect = palette[idx_arr]
            canvas[top : top + h, left : left + w] = rect
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[top : top + h, left : left + w] = 0
            elif disposal == 3:
                canvas[top : top + h, left : left + w] = prev
            # a GCE governs only the image that follows it
            disposal, trans_idx = 0, None
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def _decode_pixels(payload: bytes) -> np.ndarray:
    """Decode dispatch: BMP, truecolor PNG, palette GIF, and baseline
    JPEG are handled natively; every other format is the SEAM where an
    external codec (PIL.Image.open(io.BytesIO(payload)), torchaudio,
    ...) plugs in — those libs are not in this container."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:6] in GIF_SIGNATURES:
        return decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        from stockpy_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "pixel decode for non-BMP/PNG/GIF/JPEG payloads requires an image "
        "codec (PIL/opencv) not present in this environment"
    )


def _fake_pixels(doc_id: int) -> np.ndarray:
    """Deterministic test image for doc_id: dims (doc_id%6+4,
    doc_id%8+4), pixel[y,x,c] = (doc_id*31 + y*17 + x*7 + c*5) % 256.
    Closed-form, so an SQL oracle can compute expected pixel stats
    without running the codec — which is exactly what lets the decode
    path be hash-checked cross-engine."""
    w = int(doc_id) % 8 + 4
    h = int(doc_id) % 6 + 4
    y = np.arange(h).reshape(h, 1, 1)
    x = np.arange(w).reshape(1, w, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((int(doc_id) * 31 + y * 17 + x * 7 + c * 5) % 256).astype(np.uint8)


# Single-split guard for the payload generators (the r15
# mm_video_frames/mm_gif_frames lesson — 11x and 3x at sf0.1): their
# cost is per-row codec CPU, so a one-split input serializes the whole
# corpus onto one core. Generalized in r16 to the whole CPU-dense
# narrow-stage family and moved to operators/spread.py (which also
# hardens the probe-skip: any shuffle-bearing plan is skipped, by
# logical-node class walk rather than string match). The private name
# stays importable for the r15 test pins.
_spread_small_input = spread_small_input


def _attach_image_payload(
    df: DataFrame, id_col: str, encoder, media_type: str
) -> DataFrame:
    """Generate a real image payload per row (deterministic pixels from
    the id, containerized by ``encoder``) + typed metadata — the asset
    frame for exercising the actual decode path. Arrow-batched via
    mapInPandas; payload bytes never touch the driver."""

    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [encoder(_fake_pixels(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "media_type": media_type,
                    "width": [i % 8 + 4 for i in ids],
                    "height": [i % 6 + 4 for i in ids],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = _spread_small_input(df.select(id_col)).mapInPandas(gen, gen_schema)
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            "media_type", "width", "height", "n_bytes"
        ).alias("meta"),
    )


def attach_bmp_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Real 24-bit BMP payload per row (see :func:`_attach_image_payload`)."""
    return _attach_image_payload(df, id_col, encode_bmp, "image/bmp")


def attach_png_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Real 8-bit truecolor PNG payload per row (deflate-compressed,
    CRC-framed — see :func:`_attach_image_payload`)."""
    return _attach_image_payload(df, id_col, encode_png, "image/png")


def attach_gif_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Real palette GIF89a payload per row (LZW-compressed index stream
    — see :func:`_attach_image_payload`)."""
    return _attach_image_payload(df, id_col, encode_gif, "image/gif")


def _fake_frame(doc_id: int, frame: int) -> np.ndarray:
    """Frame ``frame`` of the deterministic test ANIMATION for doc_id:
    same dims as :func:`_fake_pixels`, pixel[y,x,c] =
    (doc_id*31 + frame*13 + y*17 + x*7 + c*5) % 256 — closed-form per
    frame, so an SQL oracle can state per-frame pixel stats without
    running the codec."""
    w = int(doc_id) % 8 + 4
    h = int(doc_id) % 6 + 4
    y = np.arange(h).reshape(h, 1, 1)
    x = np.arange(w).reshape(1, w, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return (
        (int(doc_id) * 31 + int(frame) * 13 + y * 17 + x * 7 + c * 5) % 256
    ).astype(np.uint8)


def attach_gif_anim_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Real ANIMATED GIF89a payload per row: doc_id % 3 + 2 frames of
    the closed-form frame pattern, local color table + LZW stream per
    frame (see :func:`encode_gif_animated`). Frame 0 is a plain opaque
    base (disposal 1); every later frame f exercises the FULL
    compositing model — its pixels at (x + y + f) % 2 == 0 are flagged
    TRANSPARENT and the frame carries disposal 3 (restore-to-previous),
    so the rendered canvas for f >= 1 is closed-form: base-frame pixels
    where transparent, frame-f pattern elsewhere, with the canvas
    restored to the base before the next frame (a decoder that ignores
    disposal 3 leaks frame f-1's pattern into frame f's transparent
    holes and hash-mismatches the oracle). Arrow-batched mapInPandas;
    payload bytes never touch the driver."""

    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")

            def anim(i: int) -> bytes:
                nf = i % 3 + 2
                h, w = i % 6 + 4, i % 8 + 4
                yy = np.arange(h).reshape(h, 1)
                xx = np.arange(w).reshape(1, w)
                return encode_gif_animated(
                    [_fake_frame(i, f) for f in range(nf)],
                    transparent_masks=[None]
                    + [(xx + yy + f) % 2 == 0 for f in range(1, nf)],
                    disposals=[1] + [3] * (nf - 1),
                )

            payloads = [anim(i) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "media_type": "image/gif",
                    "width": [i % 8 + 4 for i in ids],
                    "height": [i % 6 + 4 for i in ids],
                    "n_frames": [i % 3 + 2 for i in ids],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = _spread_small_input(df.select(id_col)).mapInPandas(gen, gen_schema)
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            "media_type", "width", "height", "n_frames", "n_bytes"
        ).alias("meta"),
    )


def extract_frame_features(assets: DataFrame, every_k: int = 1) -> DataFrame:
    """Decode EVERY frame of each (possibly animated) GIF payload
    through the full LZW + compositing pipeline and emit one row per
    SAMPLED frame (``every_k`` = keep frames 0, k, 2k, ... — the video
    frame-sampling shape): (doc_id, frame_id, width, height, px_sum,
    mean_lum). Arrow-batched mapInPandas over the binary column; the
    fan-out is frames-per-payload, executor-side only."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_id", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("px_sum", T.LongType()),
            T.StructField("mean_lum", T.DoubleType()),
        ]
    )

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "frame_id", "width", "height", "px_sum", "mean_lum"
            )}
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_gif_frames(bytes(payload))
                for fid, fr in enumerate(frames):
                    if fid % every_k != 0:
                        continue
                    h, w, _ = fr.shape
                    s = int(fr.astype(np.int64).sum())
                    rows["doc_id"].append(int(i))
                    rows["frame_id"].append(fid)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["px_sum"].append(s)
                    rows["mean_lum"].append(s / (h * w * 3))
            yield pd.DataFrame(rows)

    return assets.select("doc_id", "payload").mapInPandas(batch, out_schema)


def attach_jpeg_payload(
    df: DataFrame, id_col: str, quality: int = 100, subsample: bool = False
) -> DataFrame:
    """Real baseline JFIF JPEG payload per row (DCT + quantization +
    Huffman — operators/jpeg.py). Defaults to quality 100 / 4:4:4,
    where the lossy pipeline's error on the fixture pattern is bounded
    at 2 levels per channel (measured over every fixture image) — the
    bound the gate_jpeg_fidelity driver query pins."""
    from stockpy_spark.operators.jpeg import encode_jpeg

    return _attach_image_payload(
        df,
        id_col,
        lambda px: encode_jpeg(px, quality=quality, subsample=subsample),
        "image/jpeg",
    )


PIXEL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("mean_lum", T.DoubleType()),
        T.StructField("media_type", T.StringType()),
    ]
)


def extract_pixel_features(
    assets: DataFrame, on_error: str = "raise"
) -> DataFrame:
    """The ``use_codec`` path made real: decode each payload
    (:func:`_decode_pixels` — native BMP here, PIL/torchaudio at the
    seam for other formats) and compute features from the DECODED
    pixel array, not the container bytes. Same mapInPandas shape as
    :func:`extract_features`.

    ``on_error`` (r11 degenerate sweep): the default ``"raise"`` keeps
    the strict oracle semantics — any undecodable payload fails the
    job. At corpus scale a single truncated/corrupt blob must NOT
    kill a 100 TB pipeline, so ``on_error="null"`` is the production
    mode: failed rows keep their identity with NULL feature columns
    plus a ``decode_error`` string (the exception message — corrupt
    container vs codec-seam format is readable from it), and healthy
    rows in the same Arrow batch are unaffected."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    tolerant = on_error == "null"

    def batch_pixels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded, errors = [], []
            for p in pdf["payload"]:
                if not tolerant:
                    decoded.append(_decode_pixels(p))
                    errors.append(None)
                    continue
                try:
                    decoded.append(_decode_pixels(p))
                    errors.append(None)
                except Exception as e:  # noqa: BLE001 — per-row isolation
                    decoded.append(None)
                    errors.append(f"{type(e).__name__}: {e}"[:200])
            cols = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": [None if px is None else px.shape[1] for px in decoded],
                "height": [None if px is None else px.shape[0] for px in decoded],
                "px_sum": [
                    None if px is None else int(px.sum(dtype=np.int64))
                    for px in decoded
                ],
                # plain IEEE division (no rounding): int/int division
                # is bit-identical across engines, while Python
                # banker's-rounds and SQL rounds half-away
                "mean_lum": [
                    None
                    if px is None
                    else float(px.sum(dtype=np.int64)) / px.size
                    for px in decoded
                ],
                "media_type": pdf["meta"].map(lambda m: m["media_type"]),
            }
            if tolerant:
                cols["decode_error"] = errors
            yield pd.DataFrame(cols)

    schema = (
        T.StructType(
            PIXEL_FEATURE_SCHEMA.fields
            + [T.StructField("decode_error", T.StringType())]
        )
        if tolerant
        else PIXEL_FEATURE_SCHEMA
    )
    return assets.mapInPandas(batch_pixels, schema)


def extract_features(assets: DataFrame, use_codec: bool = False) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow-batched: each task receives pandas batches of (doc_id, payload,
    meta); features are computed vectorized per batch. With
    ``use_codec=True`` every payload is run through the real decoder
    (validating decodability; BMP natively, other formats raise at the
    codec seam) — use :func:`extract_pixel_features` for features over
    the decoded pixels themselves.
    """

    def batch_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_codec:
                for p in payloads:
                    _decode_pixels(p)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                    "byte_sum_mod": payloads.map(
                        lambda b: sum(b) % 1_000_003
                    ).astype("int64"),
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                }
            )

    return assets.mapInPandas(batch_features, FEATURE_SCHEMA)


WAV_SAMPLE_RATE = 8000


def encode_wav(
    samples: np.ndarray,
    sample_rate: int = WAV_SAMPLE_RATE,
    sampwidth: int = 2,
) -> bytes:
    """Encode an integer sample array as PCM WAV via the stdlib
    ``wave`` module (RIFF/WAVE container, no external codec). 1-D input
    is mono; (n_frames, n_channels) input interleaves channels.
    ``sampwidth`` bytes per sample: 1 (unsigned 8-bit, stored +128 per
    the PCM convention), 2, 3 (packed little-endian 24-bit), or 4."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if sampwidth == 1:
        data = (arr.astype(np.int32) + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif sampwidth == 2:
        data = arr.astype("<i2").tobytes()
    elif sampwidth == 3:
        # low 3 little-endian bytes of the int32 two's-complement value
        flat = np.ascontiguousarray(arr.astype("<i4")).view(np.uint8)
        data = flat.reshape(n * ch, 4)[:, :3].tobytes()
    elif sampwidth == 4:
        data = arr.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(data)
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload into (samples, sample_rate): 1-D for
    mono (int16 for 16-bit input — the original contract — int16 for
    8-bit after the -128 recenter, int32 for 24/32-bit), and
    (n_frames, n_channels) for multi-channel. 24-bit frames are
    unpacked and sign-extended manually (numpy has no 3-byte dtype).
    Compressed formats (MP3/FLAC) remain the audio seam where a real
    codec (torchaudio/soundfile) would plug in."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 1:  # PCM 8-bit is unsigned; recenter to signed
        s = np.frombuffer(raw, np.uint8).astype(np.int16) - 128
    elif width == 2:
        s = np.frombuffer(raw, dtype="<i2")
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int32)
        s = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        s = (s ^ 0x800000) - 0x800000  # sign-extend bit 23
    elif width == 4:
        s = np.frombuffer(raw, dtype="<i4")
    else:
        raise ValueError(f"unsupported WAV sample width {width * 8}-bit")
    return (s.reshape(-1, ch) if ch > 1 else s), rate


def _fake_samples(doc_id: int) -> np.ndarray:
    """Deterministic test clip for doc_id: n = doc_id%32+16 samples,
    sample[i] = (doc_id*7 + i*13) % 2048 - 1024. Closed-form like
    :func:`_fake_pixels`, so the SQL oracle computes expected amplitude
    stats arithmetically without running the codec."""
    i = np.arange(int(doc_id) % 32 + 16, dtype=np.int64)
    return ((int(doc_id) * 7 + i * 13) % 2048 - 1024).astype(np.int16)


def attach_wav_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Real 16-bit mono PCM WAV payload per row (deterministic samples
    from the id) + typed metadata. Same mapInPandas shape as the image
    attachers; payload bytes never touch the driver."""

    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [encode_wav(_fake_samples(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "media_type": "audio/wav",
                    "sample_rate": WAV_SAMPLE_RATE,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = _spread_small_input(df.select(id_col)).mapInPandas(gen, gen_schema)
    return flat.select(
        "doc_id",
        "payload",
        F.struct("media_type", "sample_rate", "n_bytes").alias("meta"),
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("amp_sum", T.LongType()),
        T.StructField("sq_sum", T.LongType()),
        T.StructField("media_type", T.StringType()),
    ]
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Decode each WAV payload and compute amplitude stats from the
    DECODED int16 samples (not the container bytes): sample count, sum
    of amplitudes, sum of squared amplitudes — the algebraic partials
    from which mean/RMS derive exactly at query time."""

    def batch_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_wav(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_samples": [len(s) for s, _ in decoded],
                    "sample_rate": [r for _, r in decoded],
                    "amp_sum": [
                        int(s.sum(dtype=np.int64)) for s, _ in decoded
                    ],
                    "sq_sum": [
                        int((s.astype(np.int64) ** 2).sum()) for s, _ in decoded
                    ],
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                }
            )

    return assets.mapInPandas(batch_audio, AUDIO_FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' shape for video-like payloads: slice each payload
    at a fixed stride into frame offsets (binary slicing stays JVM-side
    via substring on binary)."""
    return assets.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest((F.octet_length("payload") / every_n_bytes), F.lit(1)).cast("int"),
                ),
                lambda i: F.substring(
                    F.col("payload"), (i - 1) * every_n_bytes + 1, every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    )


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) array via integer index
    maps (src = (dst * src_len) // dst_len — pure integer arithmetic,
    so an SQL oracle can reproduce the exact sample grid)."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


def extract_resized_features(
    assets: DataFrame, out_h: int, out_w: int
) -> DataFrame:
    """The brief's resize step made real: decode each payload, resize
    the DECODED pixel array (nearest-neighbor), compute stats over the
    resized thumbnail. Same mapInPandas shape as
    :func:`extract_pixel_features`; at production scale the only change
    is swapping resize_nearest for a SIMD codec at the same seam."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                resize_nearest(_decode_pixels(p), out_h, out_w)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": [t.shape[1] for t in thumbs],
                    "height": [t.shape[0] for t in thumbs],
                    "px_sum": [int(t.sum(dtype=np.int64)) for t in thumbs],
                    "mean_lum": [
                        float(t.sum(dtype=np.int64)) / t.size for t in thumbs
                    ],
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                }
            )

    return assets.mapInPandas(batch, PIXEL_FEATURE_SCHEMA)


AUDIO_DSP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("peak_amp", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("max_frame_energy", T.LongType()),
        T.StructField("loudest_frame", T.IntegerType()),
    ]
)


def extract_audio_dsp(assets: DataFrame, frame_samples: int = 16) -> DataFrame:
    """Signal-level audio screens over the DECODED samples — the
    features an audio-corpus curator filters on before any model sees
    the clip: zero-crossing count (noise vs tonal content), peak
    amplitude (clipping / silence detection), and the loudest
    short-time frame energy (``frame_samples``-sample frames, sum of
    squares — a silence-trimmed clip has its max frame well above its
    mean). All integer arithmetic over int16 samples, so the driver
    oracle recomputes every value exactly from the closed-form sample
    pattern — the hash gate covers real numpy DSP, not a stub.

    Zero-crossing convention: a crossing is counted between
    consecutive samples whose (value >= 0) signs differ. Frames are
    non-overlapping; the tail partial frame counts (its energy is a
    sum over fewer samples — honest, and what loudest-frame detection
    wants). ``loudest_frame`` ties resolve to the earliest frame.
    Arrow-batched mapInPandas like every codec stage: payload bytes
    never touch the driver.
    """

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                s, _rate = decode_wav(payload)
                s64 = s.astype(np.int64)
                nonneg = s64 >= 0
                zcr = int((nonneg[1:] != nonneg[:-1]).sum())
                peak = int(np.abs(s64).max()) if len(s64) else 0
                n_frames = (len(s64) + frame_samples - 1) // frame_samples
                energies = np.add.reduceat(
                    s64 * s64, np.arange(0, len(s64), frame_samples)
                )
                loudest = int(np.argmax(energies))
                rows.append(
                    (
                        int(doc_id),
                        len(s64),
                        zcr,
                        peak,
                        int(n_frames),
                        int(energies[loudest]),
                        loudest,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "zero_crossings",
                    "peak_amp",
                    "n_frames",
                    "max_frame_energy",
                    "loudest_frame",
                ],
            )

    return assets.mapInPandas(batch, AUDIO_DSP_SCHEMA)


BLOB_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("uri", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
    ]
)


def pack_blob_shards(
    assets: DataFrame, id_col: str, out_dir: str, n_shards: int = 4
) -> DataFrame:
    """The pointer-to-blob half of the multimodal pattern made real
    (WebDataset/recordio shape): concatenate each partition's payload
    bytes into ONE binary shard file and return the POINTER INDEX
    (id, uri, offset, length) — the frame a 100 TB corpus actually
    stores in its metadata table, with the bytes living in few large
    objects instead of billions of tiny ones (the small-file problem
    that kills object-store listing and scan throughput).

    Executor-side end to end: ``repartition(n_shards)`` then one
    ``mapPartitions`` pass per shard that appends payloads to a
    task-local file and yields the index rows; payload bytes never
    touch the driver. Crash/speculation safety: each task writes
    ``.tmp-{uuid}`` and renames into place only on completion, so a
    re-executed task never interleaves with a half-written shard (on
    an object store the rename becomes a PUT of the completed part).
    The shard id comes from TaskContext.partitionId, so uris are
    deterministic per partitioning.

    ``out_dir`` must be a path every executor AND the driver-side
    reader can reach — a shared filesystem (NFS/DBFS/FUSE-mounted
    object store) on a real cluster, any local path in local mode. The
    returned uris are plain paths into that dir; on a cluster without
    a shared mount the shards land on executor-local disks and
    :func:`read_blob_slices` will fail to open them (loudly — the
    open() raises, nothing reads wrong bytes). Same contract as the
    CDC sink's snapshot dir. Each task makedirs inside the task so the
    write degrades with that explicit error, not a driver-only dir.
    """
    import os
    import uuid

    from pyspark import TaskContext

    def pack(rows):
        pid = TaskContext.get().partitionId()
        os.makedirs(out_dir, exist_ok=True)
        final = os.path.join(out_dir, f"shard-{pid:05d}.bin")
        tmp = f"{final}.tmp-{uuid.uuid4().hex}"
        off = 0
        out = []
        with open(tmp, "wb") as f:
            for r in rows:
                payload = bytes(r["payload"])
                f.write(payload)
                out.append((r[id_col], final, off, len(payload)))
                off += len(payload)
        os.replace(tmp, final)
        return iter(out)

    return (
        assets.select(id_col, "payload")
        .repartition(n_shards)
        .rdd.mapPartitions(pack)
        .toDF(BLOB_INDEX_SCHEMA)
    )


def read_blob_slices(index: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Resolve a pointer index back to payload bytes: Arrow-batched
    ``mapInPandas`` that opens each referenced shard ONCE per batch
    (sorted by (uri, offset) so reads are sequential within a shard —
    the access pattern object stores and page caches reward) and
    slices out each (offset, length) range. The inverse of
    :func:`pack_blob_shards`; downstream decode/feature ops take the
    result anywhere they take inline payloads.
    """

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.sort_values(["uri", "offset"])
            ids, payloads = [], []
            handle, handle_uri = None, None
            try:
                for r in pdf.itertuples(index=False):
                    if r.uri != handle_uri:
                        if handle is not None:
                            handle.close()
                        handle = open(r.uri, "rb")
                        handle_uri = r.uri
                    handle.seek(r.offset)
                    ids.append(getattr(r, id_col))
                    payloads.append(handle.read(r.length))
            finally:
                if handle is not None:
                    handle.close()
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    return index.mapInPandas(read, out_schema)


EQUALIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_px", T.IntegerType()),
        T.StructField("pre_min", T.IntegerType()),
        T.StructField("pre_max", T.IntegerType()),
        T.StructField("post_min", T.IntegerType()),
        T.StructField("post_max", T.IntegerType()),
        T.StructField("post_sum", T.LongType()),
    ]
)


def equalize_lum(pixels: np.ndarray) -> np.ndarray:
    """Histogram equalization of the image's integer luminance plane
    (lum = (r+g+b)//3) — the classic contrast-normalization step run
    before feature extraction / perceptual hashing so exposure
    differences stop masquerading as content differences. Pinned
    integer formula (OpenCV's, floor division):
    ``out(v) = ((cdf(v) - cdf_min) * 255) // (n - cdf_min)`` with
    ``cdf_min`` the count of the lowest occupied luminance; a constant
    image (n == cdf_min) maps to all zeros. Every step is integer, so
    the SQL oracle replays it exactly from the closed-form pixels."""
    lum = pixels.astype(np.int64).sum(axis=2) // 3
    hist = np.bincount(lum.ravel(), minlength=256)
    cdf = hist.cumsum()
    n = lum.size
    cdf_min = int(cdf[cdf > 0][0]) if n else 0
    if n == 0 or n == cdf_min:
        return np.zeros_like(lum)
    lut = np.clip(((cdf - cdf_min) * 255) // (n - cdf_min), 0, 255)
    return lut[lum]


def extract_equalized_features(assets: DataFrame) -> DataFrame:
    """Decode -> equalize -> stats, Arrow-batched like every codec
    stage. Surfaces the pre/post luminance spread so the oracle checks
    the REMAP (post_sum pins every LUT entry times its count), not
    just that something ran."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                px = _decode_pixels(payload)
                lum = px.astype(np.int64).sum(axis=2) // 3
                eq = equalize_lum(px)
                rows.append(
                    (
                        int(doc_id),
                        int(lum.size),
                        int(lum.min()),
                        int(lum.max()),
                        int(eq.min()),
                        int(eq.max()),
                        int(eq.sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_px", "pre_min", "pre_max",
                    "post_min", "post_max", "post_sum",
                ],
            )

    return assets.mapInPandas(batch, EQUALIZE_SCHEMA)


# --- MJPEG-in-AVI video container (round 14) -------------------------------

def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Real AVI RIFF container holding one Motion-JPEG video stream —
    pure stdlib ``struct`` over :func:`operators.jpeg.encode_jpeg`
    (each frame an independent baseline JFIF image, which is exactly
    what the MJPG fourcc means). Layout follows the public Microsoft
    AVI RIFF spec: ``RIFF('AVI ')`` -> ``LIST('hdrl')`` with the
    ``avih`` MainAVIHeader and one ``LIST('strl')`` ('strh' stream
    header fccType='vids'/fccHandler='MJPG' + 'strf'
    BITMAPINFOHEADER with biCompression='MJPG') -> ``LIST('movi')``
    of ``00dc`` compressed-frame chunks (word-aligned, as RIFF
    requires) -> a standard ``idx1`` keyframe index. All frames must
    share one (h, w): AVI is a fixed-dimension container."""
    from stockpy_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg: at least one frame required")
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("encode_avi_mjpeg: all frames must share dims")
    jpegs = [encode_jpeg(f, quality=100, subsample=False) for f in frames]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(list_type: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", list_type + data)

    max_bytes = max(len(j) for j in jpegs)
    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        usec_per_frame,          # dwMicroSecPerFrame
        max_bytes * fps,         # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(jpegs),              # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        w,                       # dwWidth
        h,                       # dwHeight
        0, 0, 0, 0,              # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0,             # dwFlags, wPriority, wLanguage
            0,                   # dwInitialFrames
            1, fps,              # dwScale / dwRate -> fps
            0, len(jpegs),       # dwStart, dwLength (frames)
            max_bytes,           # dwSuggestedBufferSize
            0xFFFFFFFF,          # dwQuality (default)
            0,                   # dwSampleSize (0: variable, 1 chunk = 1 frame)
            0, 0, w, h,          # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", len(jpegs[0]), 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    idx_entries = []
    for j in jpegs:
        # idx1 offsets are relative to the position of the 'movi'
        # fourcc; the next chunk lands at the current body length
        idx_entries.append((len(movi_body), len(j)))
        movi_body += chunk(b"00dc", j)
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln)  # AVIIF_KEYFRAME
            for off, ln in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_frames(payload: bytes) -> list[np.ndarray]:
    """Parse an MJPEG AVI back to its frame list: a RIFF chunk walk
    (no fixed offsets — any conforming writer's padding/extra chunks
    are skipped structurally), the ``avih`` header read for the frame
    count and canvas dims, every ``##dc``/``##db`` chunk in
    ``LIST('movi')`` JPEG-decoded, and the header CROSS-CHECKED
    against the actual stream (frame count and per-frame dims) so a
    truncated or inconsistent container fails loudly instead of
    yielding a silently-short video."""
    from stockpy_spark.operators.jpeg import decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("decode_avi_frames: not a RIFF/AVI payload")

    def walk(data: bytes, pos: int, end: int):
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            yield fourcc, body_start, size
            pos = body_start + size + (size % 2)  # word alignment

    n_frames = width = height = None
    frames: list[np.ndarray] = []
    for fourcc, start, size in walk(payload, 12, 8 + struct.unpack_from("<I", payload, 4)[0]):
        if fourcc == b"LIST":
            list_type = payload[start:start + 4]
            if list_type == b"hdrl":
                for fc2, s2, sz2 in walk(payload, start + 4, start + size):
                    if fc2 == b"avih":
                        vals = struct.unpack_from("<14I", payload, s2)
                        n_frames, width, height = vals[4], vals[8], vals[9]
            elif list_type == b"movi":
                for fc2, s2, sz2 in walk(payload, start + 4, start + size):
                    if fc2[2:4] in (b"dc", b"db"):
                        frames.append(decode_jpeg(payload[s2:s2 + sz2]))
    if n_frames is None:
        raise ValueError("decode_avi_frames: no avih header found")
    if len(frames) != n_frames:
        raise ValueError(
            f"decode_avi_frames: header promises {n_frames} frames, "
            f"movi stream holds {len(frames)} — truncated container?"
        )
    for i, f in enumerate(frames):
        if f.shape != (height, width, 3):
            raise ValueError(
                f"decode_avi_frames: frame {i} dims {f.shape[:2]} != "
                f"header canvas ({height}, {width})"
            )
    return frames


def attach_avi_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Real MJPEG-AVI payload per row: ``doc_id % 3 + 2`` frames of the
    closed-form :func:`_fake_frame` pattern, each a quality-100 4:4:4
    JPEG inside the RIFF container. Same asset shape as the image
    attachers (payload + typed meta); media_type ``video/x-msvideo``."""
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                encode_avi_mjpeg(
                    [_fake_frame(i, f) for f in range(i % 3 + 2)]
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "media_type": "video/x-msvideo",
                    "width": [i % 8 + 4 for i in ids],
                    "height": [i % 6 + 4 for i in ids],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = _spread_small_input(df.select(id_col)).mapInPandas(gen, gen_schema)
    return flat.select(
        "doc_id",
        "payload",
        F.struct("media_type", "width", "height", "n_bytes").alias("meta"),
    )


def extract_video_frame_gates(
    assets: DataFrame, every_k: int = 1, max_err: int = 4
) -> DataFrame:
    """Video frame extraction under the JPEG FIDELITY-GATE contract
    (gate_jpeg_fidelity's answer to lossy codecs): parse each AVI,
    decode every retained frame (``every_k`` sampling — frames 0, k,
    2k, ...), and emit (doc_id, frame_id, width, height, gate_err_ok)
    where the gate checks max |decoded - closed-form source| <=
    ``max_err`` per channel (the measured quality-100 bound is 2).
    Closed-form columns + a literal gate bit = an exact SQL oracle
    over a lossy codec chain."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_id", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("gate_err_ok", T.IntegerType()),
        ]
    )

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "frame_id", "width", "height", "gate_err_ok"
            )}
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_avi_frames(bytes(payload))
                for fid, fr in enumerate(frames):
                    if fid % every_k != 0:
                        continue
                    src = _fake_frame(int(i), fid).astype(int)
                    ok = (
                        fr.shape == src.shape
                        and int(np.abs(fr.astype(int) - src).max()) <= max_err
                    )
                    h, w, _ = fr.shape
                    rows["doc_id"].append(int(i))
                    rows["frame_id"].append(fid)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["gate_err_ok"].append(int(ok))
            yield pd.DataFrame(rows)

    return assets.select("doc_id", "payload").mapInPandas(batch, out_schema)
