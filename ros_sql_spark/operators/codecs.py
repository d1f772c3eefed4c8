"""Pure-Python image codecs (BMP / PPM / PNG / JPEG / GIF) for the multimodal
real path.

The container has no PIL/ffmpeg, so ``operators/multimodal.py``'s
``deterministic_fake=False`` path used to be an honest
NotImplementedError gate that no test had ever driven end-to-end.  This
module closes that gap with real, dependency-free codecs for the
formats implementable exactly from their public specifications:

- **BMP**: uncompressed 24-bit BI_RGB Windows bitmaps (the
  BITMAPFILEHEADER/BITMAPINFOHEADER layout documented by Microsoft),
  bottom-up and top-down, with 4-byte row padding;
- **PPM**: binary P6 netpbm with maxval 255 (the netpbm format spec),
  including whitespace/comment-tolerant header parsing;
- **PNG**: every spec bit depth (1/2/4/8/16) for gray and palette,
  8/16 for RGB/gray-alpha/RGBA, plain and Adam7-interlaced, per the
  public W3C spec — stdlib zlib inflate plus all five scanline filters
  (Sub reconstructed as a per-lane mod-256 cumulative sum;
  Average/Paeth sequential where the spec's recurrence demands it);
  sub-byte rows unfilter as packed bytes (bpp=1 per spec) then
  bit-unpack MSB-first (round-12: the last PNG gate closed);
- **JPEG**: sequential DCT per ITU-T T.81 — baseline (SOF0/SOF1) and
  PROGRESSIVE (SOF2: spectral selection + successive approximation,
  EOB runs) decoders, tables read from the file, 1/3 components,
  4:4:4 and 4:2:0, plus Annex-K-table baseline and progressive
  encoders, numpy DCT, restart intervals in BOTH modes (DRI + RSTn
  sequence-checked; progressive resets DC predictors and EOB runs per
  scan walk) and 12-BIT samples in BOTH modes (16-bit DQT, DC
  categories to 15, level shift 2048, high-8-bit output — sequential
  AND progressive closed in round-12); arithmetic coding raises
  NotImplementedError naming the feature.  Entropy coding is
  per-symbol Python (correctness-first;
  decode happens inside Arrow-batched mapInPandas where per-asset
  cost is the accepted trade);
- **GIF**: 87a/89a palette images with a REAL variable-width LZW
  encoder/decoder (LSB-first packing, clear/EOI, 12-bit cap with
  dictionary resets), local color tables and 4-pass interlacing on
  decode; first frame only, transparency maps to its palette color.

Everything is numpy-vectorized per image (no per-pixel Python), and the
encode side exists so tests can synthesize REAL bytes to push through
the Spark plumbing.  ``decode_image`` sniffs magic bytes and falls back
to PIL if (and only if) it happens to be importable, so a user with
Pillow installed gets their JPEG/PNG support for free through the same
interface; genuinely unsupported payloads still raise
NotImplementedError — the honest gate shrinks, it does not move.

Named gates — the AUTHORITATIVE list is the ``GATES`` registry right
below ``__all__`` (slug → description), mirrored here for the reader;
``CLOSED`` records formerly-gated features now implemented.  Prose in
this file may describe gates, but the registry is the contract:
tests/test_codecs.py::test_gate_registry_matches_behavior constructs a
real stream per GATES slug and asserts the NotImplementedError, decodes
one stream per CLOSED slug, and asserts this docstring block lists
exactly the open slugs — the round-12 doc-rot class (12-bit progressive
listed as a gate months after it closed) is now a red test, the
SinglePartition-allowlist precedent applied to docs.

  open: bmp-non-24bit ppm-maxval png-color-type jpeg-arithmetic-sof
  jpeg-precision jpeg-components jpeg-sampling
  tiff-depth tiff-photometric tiff-spp tiff-compression tiff-predictor
  tiff-predictor-subbyte tiff-fillorder tiff-g4-extension
  wav-format-tag wav-depth
  y4m-colorspace unknown-image-magic
"""

from __future__ import annotations

import io
import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_ppm",
    "decode_ppm",
    "encode_png",
    "decode_png",
    "encode_jpeg",
    "decode_jpeg",
    "encode_gif",
    "decode_gif",
    "decode_image",
    "resize_nearest",
    "image_features",
    "encode_wav",
    "decode_wav",
    "audio_features",
    "media_features",
    "encode_y4m",
    "decode_y4m",
    "video_features",
    "GATES",
    "CLOSED",
]

#: Honest-gate registry — THE authoritative list of named
#: NotImplementedError gates in this module.  The module docstring's
#: "open:" block, this dict, and actual decoder behavior are kept in
#: three-way agreement by tests/test_codecs.py (a constructed stream
#: per slug must raise; a CLOSED slug must decode; the docstring block
#: must equal GATES' keys).  Adding a feature = move its slug from
#: GATES to CLOSED, update the docstring line, and the test's
#: constructor flips from "expect raise" to "expect decode".
GATES = {
    "bmp-non-24bit": "BMP bpp != 24 or compressed (BI_RGB 24-bit only)",
    "ppm-maxval": "PPM maxval != 255",
    "png-color-type": "PNG color types outside the spec five (0/2/3/4/6)",
    "jpeg-arithmetic-sof": "arithmetic-coded (SOF9/SOF10 — a QM-coder "
                           "can't be validated against external streams "
                           "in this container) and lossless/hierarchical "
                           "SOF3/5/6/7/11/13/14/15 JPEG",
    "jpeg-precision": "JPEG sample precisions other than 8/12 "
                      "(and 12-bit under SOF0, illegal per T.81 B.2)",
    "jpeg-components": "JPEG component counts other than 1/3 (CMYK/YCCK)",
    "jpeg-sampling": "JPEG sampling factors > 2",
    "tiff-depth": "TIFF bits-per-sample outside 1/4/8/16 "
                  "(and mixed-depth channels)",
    "tiff-predictor-subbyte": "TIFF predictor 2 on 1/4-bit samples "
                              "(undefined by the spec's byte model)",
    "tiff-photometric": "TIFF photometric interpretations beyond 0-3",
    "tiff-spp": "TIFF samples-per-pixel other than 1/3",
    "tiff-compression": "TIFF compressions beyond none/LZW/Deflate/"
                        "PackBits/CCITT (MH/G3/G4)/JPEG-7: old-style "
                        "JPEG 6, JBIG, JPEG2000; also compression-7 "
                        "RGB-photometric-2 and planar-2 layouts",
    "tiff-fillorder": "TIFF FillOrder 2 (LSB-first) with "
                      "byte-oriented codecs (LZW/Deflate/PackBits/"
                      "JPEG) or non-bilevel data — the fax CCITT + "
                      "uncompressed bilevel shapes closed in r15",
    "tiff-g4-extension": "CCITT 2-D extension codes (T.4/T.6 "
                         "uncompressed mode)",
    "tiff-predictor": "TIFF predictors other than 1/2",
    "wav-format-tag": "WAVE format tags beyond integer PCM / IEEE "
                      "float / G.711 A-law+µ-law and their "
                      "extensible-GUID forms (ADPCM, non-standard "
                      "extensible SubFormats, padded valid-bits)",
    "wav-depth": "WAVE integer PCM bit depths other than 8/16/32",
    "y4m-colorspace": "y4m colorspaces other than the C420 family / C444",
    "unknown-image-magic": "image payloads no native codec recognizes "
                           "(when Pillow is not importable)",
}

#: Formerly-gated features, now implemented — the doc-rot guard's
#: decode-must-succeed list (each slug has a constructor in the test).
CLOSED = (
    "jpeg-12bit-sequential",   # round-12 (SOF1, 16-bit DQT)
    "jpeg-12bit-progressive",  # round-12 (SOF2 prec 12)
    "jpeg-dri",                # restart intervals, both modes
    "jpeg-non-interleaved",    # one SOS per component
    "jpeg-partial-interleave",  # round-13 ([Y] + [Cb,Cr] split scans)
    "png-sub-byte-depth",      # 1/2/4-bit gray + palette
    "png-adam7",               # interlaced decode
    "png-16bit",               # 16-bit gray/RGB
    "tiff-deflate",            # compression 8 + legacy 32946
    "tiff-big-endian",         # MM byte order
    "tiff-tiled",              # round-13 (§15 tile grids, tags 322-325)
    "tiff-palette",            # round-13 (photometric 3, ColorMap 320)
    "tiff-planar2",            # round-13 (per-plane strip sequences)
    "tiff-planar2-tiled",      # round-13 (per-plane tile sequences)
    "tiff-16bit",              # round-13 (high-byte output, both orders)
    "tiff-subbyte",            # round-13 (1/4-bit gray, MSB-first rows)
    "tiff-g4",                 # round-14 (CCITT Group 4 / T.6 MMR)
    "tiff-mh",                 # round-14 (compression 2: per-line MH)
    "tiff-t4",                 # round-14 (compression 3, 1-D + EOLs)
    "tiff-t4-2d",              # round-14 (compression 3, T4Options 2-D)
    "wav-float",               # round-14 (IEEE float 32/64, tag 3)
    "wav-alaw",                # round-14 (G.711 A-law, tag 6)
    "wav-mulaw",               # round-14 (G.711 µ-law, tag 7)
    "tiff-jpeg",               # round-15 (compression 7, JPEGTables 347)
    "tiff-fillorder-fax",      # round-15 (FillOrder 2, CCITT + raw bilevel)
    "wav-extensible",          # round-15 (0xFFFE + standard SubFormat GUIDs)
)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit BI_RGB BMP bytes
    (bottom-up, rows padded to 4 bytes — the canonical layout)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape}")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + dib + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP bytes → (H, W, 3) uint8 RGB.
    Handles bottom-up (positive height) and top-down (negative) rows."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={comp})"
        )
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    arr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return (arr[::-1] if flip else arr).copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → binary P6 PPM bytes (maxval 255)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape}")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_tokens(buf: io.BytesIO, n: int) -> list[int]:
    """Read ``n`` whitespace-separated ASCII ints, honoring '#' comments
    (netpbm header grammar)."""
    out: list[int] = []
    tok = b""
    while len(out) < n:
        c = buf.read(1)
        if not c:
            raise ValueError("truncated PPM header")
        if c == b"#":
            while c and c != b"\n":
                c = buf.read(1)
            c = b" "
        if c.isspace():
            if tok:
                out.append(int(tok))
                tok = b""
        else:
            tok += c
    return out


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM bytes (maxval 255) → (H, W, 3) uint8 RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    buf = io.BytesIO(payload[2:])
    w, h, maxval = _ppm_tokens(buf, 3)
    if maxval != 255:
        raise NotImplementedError(f"only maxval=255 PPM supported ({maxval})")
    data = buf.read(w * h * 3)
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Adam7 pass grid (x0, y0, dx, dy) per the W3C spec, pass 1..7
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)
# samples per pixel by PNG color type (palette expands to RGB later)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray, filters=None) -> bytes:
    """(H, W, 3|4) uint8 → PNG bytes (8-bit, non-interlaced; zlib from
    the stdlib).  ``filters`` selects the per-row filter type: None =
    filter 0 everywhere, an int = that filter on every row, or a
    sequence cycled across rows — tests use it to synthesize payloads
    exercising every unfilter branch of :func:`decode_png`."""
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"expected (H, W, 3|4) uint8, got {arr.shape}")
    h, w, ch = arr.shape
    bpp = ch
    raw = arr.reshape(h, w * ch).astype(np.int64)
    if filters is None:
        ftypes = [0] * h
    elif isinstance(filters, int):
        ftypes = [filters] * h
    else:
        ftypes = [filters[i % len(filters)] for i in range(h)]
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        row = raw[y]
        left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        ft = ftypes[y]
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        elif ft == 4:
            filt = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"PNG filter type {ft}")
        out.append(ft)
        out += (filt & 255).astype(np.uint8).tobytes()
        prev = row
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = zlib.compress(bytes(out), 6)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4): pick the neighbor
    closest to left+up-upleft, ties broken left, up, upleft."""
    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    return np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) uint8 RGB, pure stdlib+numpy (zlib inflate
    + the five scanline filters from the public W3C spec).

    Covers 8- and 16-bit depths over color types 0 (gray), 2 (RGB), 3
    (palette, 8-bit), 4 (gray+alpha), 6 (RGBA), both non-interlaced
    AND Adam7-interlaced (seven independent sub-images in one zlib
    stream, each with its own filter bytes, scattered back onto the
    pass grid).  Alpha is dropped (matching PIL's ``convert("RGB")``
    on the fallback path); 16-bit samples keep their HIGH byte (PIL's
    16→8 conversion).  Sub-byte palette depths raise
    NotImplementedError naming the feature; corrupt structure raises
    ValueError.  The filters' left-neighbor distance is bpp BYTES
    (channels × bytes-per-sample), so one bytewise unfilter serves
    both depths — straight from the spec.

    Unfiltering: None/Up are whole-row vectorized; Sub is a per-lane
    cumulative sum (mod-256 addition is associative, so ``cumsum & 255``
    reconstructs the prefix chain in one numpy pass per lane); Average
    and Paeth genuinely recur on the reconstructed left neighbor, so
    they run a per-lane sequential loop over columns — O(W) Python per
    filtered row, only on rows that use those filters."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln  # length + tag + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG bit depth {depth} is invalid")
    if color_type not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type}")
    if depth < 8 and color_type not in (0, 3):
        # spec: sub-byte depths exist only for grayscale and palette
        raise ValueError(
            f"PNG color type {color_type} with bit depth {depth} is invalid"
        )
    if depth == 16 and color_type == 3:
        raise ValueError("PNG palette color with 16-bit depth is invalid")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace}")
    if comp != 0 or filt_method != 0:
        raise ValueError(
            f"PNG compression/filter method {comp}/{filt_method}"
        )
    ch = _PNG_CHANNELS[color_type]
    sb = max(1, depth // 8)  # bytes per sample (sub-byte packs below)
    # the filters' left-neighbor distance is in BYTES; for sub-byte
    # depths the spec pins it to ONE byte (round-12: the 8/16 gate
    # closed — 1/2/4-bit grayscale and palette rows are filtered as
    # packed bytes, then bit-unpacked MSB-first in to_samples)
    bpp = ch * sb if depth >= 8 else 1

    def rowbytes(cols: int) -> int:
        return (cols * ch * depth + 7) // 8
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT stream corrupt/truncated: {exc}") from exc

    def unfilter(off: int, rows: int, rowbytes: int) -> tuple[np.ndarray, int]:
        """Reconstruct `rows` scanlines of `rowbytes` each starting at
        byte `off` of the inflated stream; returns (rows×rowbytes
        int64 array, offset past the last scanline)."""
        if len(raw) < off + rows * (1 + rowbytes):
            raise ValueError(
                f"PNG pixel data truncated: {len(raw)} < "
                f"{off + rows * (1 + rowbytes)}"
            )
        img = np.empty((rows, rowbytes), dtype=np.int64)
        prev = np.zeros(rowbytes, dtype=np.int64)
        for y in range(rows):
            ft = raw[off]
            row = np.frombuffer(
                raw, np.uint8, rowbytes, off + 1
            ).astype(np.int64)
            off += 1 + rowbytes
            if ft == 0:
                recon = row
            elif ft == 2:
                recon = (row + prev) & 255
            elif ft == 1:
                recon = row.copy()
                for i in range(bpp):
                    recon[i::bpp] = np.cumsum(recon[i::bpp]) & 255
            elif ft in (3, 4):
                recon = np.empty(rowbytes, dtype=np.int64)
                for x in range(rowbytes):
                    left = recon[x - bpp] if x >= bpp else 0
                    up = prev[x]
                    if ft == 3:
                        recon[x] = (row[x] + (left + up) // 2) & 255
                    else:
                        ul = prev[x - bpp] if x >= bpp else 0
                        recon[x] = (row[x] + int(_paeth(
                            np.int64(left), np.int64(up), np.int64(ul)
                        ))) & 255
            else:
                raise ValueError(f"PNG filter type {ft} at row {y}")
            img[y] = recon
            prev = recon
        return img, off

    def to_samples(rows_bytes: np.ndarray, rows: int, cols: int) -> np.ndarray:
        """(rows, rowbytes) byte matrix → (rows, cols, ch) uint8 — for
        16-bit, samples are big-endian pairs and the HIGH byte is kept
        (PIL's 16→8 conversion); sub-byte depths unpack MSB-first and
        drop the row-pad bits (spec: rows pad to a byte boundary)."""
        a = rows_bytes.astype(np.uint8)
        if depth < 8:
            bits = np.unpackbits(a, axis=1)
            nsamp = bits.shape[1] // depth
            vals = bits[:, : nsamp * depth].reshape(rows, nsamp, depth)
            weights = 1 << np.arange(depth - 1, -1, -1)
            s = (vals * weights).sum(axis=2).astype(np.uint8)
            return s[:, :cols].reshape(rows, cols, 1)
        if sb == 1:
            return a.reshape(rows, cols, ch)
        return a.reshape(rows, cols, ch, 2)[..., 0]

    if interlace == 0:
        img, _ = unfilter(0, h, rowbytes(w))
        px = to_samples(img, h, w)
    else:
        # Adam7: seven independent sub-images in one zlib stream, each
        # with its own filter bytes and its own None-row at pass start;
        # empty passes contribute no scanlines at all (spec).
        px = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, off = unfilter(off, ph, rowbytes(pw))
            px[y0::dy, x0::dx] = to_samples(sub, ph, pw)
    if color_type == 0:
        if depth < 8:
            # scale to full 8-bit range (255/(2^d - 1) is integral)
            px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px.copy()
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = px[..., 0]
        if idx.max() >= len(palette):
            raise ValueError("PNG palette index out of range")
        return palette[idx]
    if color_type == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3].copy()  # 6: RGBA → drop alpha


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-sniffing decode → (H, W, 3) uint8 RGB.

    BMP, P6 PPM, (8-bit non-interlaced) PNG, baseline JPEG, GIF and
    baseline TIFF decode natively; anything else tries PIL if it is
    importable (import-try gate — not installed in this container) and
    otherwise raises NotImplementedError naming the format.
    """
    native = None
    if payload[:2] == b"BM":
        native = decode_bmp
    elif payload[:2] == b"P6":
        native = decode_ppm
    elif payload[:8] == _PNG_SIG:
        native = decode_png
    elif payload[:2] == b"\xff\xd8":
        native = decode_jpeg
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        native = decode_gif
    elif payload[:4] in (b"II*\x00", b"MM\x00*"):
        native = decode_tiff
    gate: NotImplementedError | None = None
    if native is not None:
        try:
            return native(payload)
        except NotImplementedError as e:
            # a recognized format whose SUBFORMAT the native codec
            # gates (arithmetic JPEG, tiled TIFF, ...): PIL — when
            # importable — must still get its chance, as documented
            gate = e
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency
    except ImportError:
        if gate is not None:
            raise gate from None
        head = bytes(payload[:4])
        raise NotImplementedError(
            f"unsupported image payload (magic {head!r}): native codecs "
            "cover BMP, P6 PPM, PNG, baseline/progressive JPEG, GIF "
            "and baseline TIFF; install Pillow for other formats"
        ) from None
    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — pixel-center
    sampling, fully vectorized (one fancy-index per image)."""
    h, w = pixels.shape[:2]
    yi = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return pixels[yi[:, None], xi[None, :]]


def image_features(pixels: np.ndarray, dim: int = 8) -> list[float]:
    """Deterministic real features from decoded pixels, all in [0, 1]:
    per-channel means (3), per-channel stds (3), aspect ratio h/(h+w),
    mean luminance, then a luminance histogram for any remaining dims.
    Not a learned embedding — but a REAL function of the pixel content
    (two images differing in any channel statistic separate), which is
    what the decode path's contract needs."""
    arr = pixels.astype(np.float64) / 255.0
    h, w = arr.shape[:2]
    luma = 0.2126 * arr[..., 0] + 0.7152 * arr[..., 1] + 0.0722 * arr[..., 2]
    base = [
        *arr.mean(axis=(0, 1)).tolist(),
        *arr.std(axis=(0, 1)).tolist(),
        h / (h + w),
        float(luma.mean()),
    ]
    if dim > len(base):
        hist, _ = np.histogram(luma, bins=dim - len(base), range=(0.0, 1.0))
        base.extend((hist / luma.size).tolist())
    return [float(round(v, 9)) for v in base[:dim]]


# ---------------------------------------------------------------- GIF
# GIF87a/89a (CompuServe spec, public): LZW-compressed palette images.
# Decoder returns the FIRST frame as RGB (animation frames beyond the
# first are out of scope; transparency maps to its palette color —
# the module's RGB contract has no alpha).  Encoder writes a real
# variable-width LZW stream from a ≤256-color palette so tests
# synthesize genuine GIF bytes without PIL.


def encode_gif(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 with ≤256 distinct colors → GIF89a bytes
    (global color table + one real LZW-compressed image block)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape}")
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF needs <=256 distinct colors, image has {len(palette)} "
            "(quantize first)"
        )
    # color-table size: power of two >= max(2, n)
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    table = np.zeros((1 << bits, 3), np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, bits)

    # LZW encode (variable width, LSB-first bit packing per the spec)
    clear = 1 << min_code
    eoi = clear + 1
    out_bits = bytearray()
    acc = 0
    nacc = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    def fresh() -> dict:
        return {(i,): i for i in range(1 << min_code)}

    width = min_code + 1
    table_d = fresh()
    next_code = eoi + 1
    put(clear, width)
    seq: tuple[int, ...] = ()
    for px in idx:
        cand = seq + (int(px),)
        if cand in table_d:
            seq = cand
            continue
        put(table_d[seq], width)
        table_d[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            put(clear, width)
            table_d = fresh()
            next_code = eoi + 1
            width = min_code + 1
        seq = (int(px),)
    if seq:
        put(table_d[seq], width)
    put(eoi, width)
    if nacc:
        out_bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    data = bytes(out_bits)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a bytes → first frame as (H, W, 3) uint8 RGB (local
    color table and Adam-style interlacing honored; animation frames
    beyond the first ignored; transparency maps to its palette
    color)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise ValueError("GIF truncated inside extension block")
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02X} at {pos}")
        left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
        iflags = payload[pos + 9]
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("GIF truncated inside image data")
            ln = payload[pos]
            if ln == 0:
                break
            if pos + 1 + ln > len(payload):
                raise ValueError("GIF truncated inside image sub-block")
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(data), min_code, iw * ih)
        img = np.array(indices, np.int64).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: 4-pass row order
            rows = np.concatenate([
                np.arange(0, ih, 8), np.arange(4, ih, 8),
                np.arange(2, ih, 4), np.arange(1, ih, 2),
            ])
            deinter = np.empty_like(img)
            deinter[rows] = img
            img = deinter
        if img.max() >= len(ct):
            raise ValueError("GIF palette index out of range")
        frame = ct[img].astype(np.uint8)
        if (left, top, iw, ih) == (0, 0, w, h):
            return frame
        # first image smaller than the logical screen: composite onto
        # the background-color canvas at its declared offset, so shape
        # and pixel positions match any reference decoder
        # The background color index is defined against the GLOBAL color
        # table (GIF89a §18) — never the frame's local table, even when
        # the frame carries one.
        bg_idx = payload[11]
        bg = (
            gct[bg_idx] if gct is not None and bg_idx < len(gct)
            else np.zeros(3, np.uint8)
        )
        canvas = np.broadcast_to(bg, (h, w, 3)).copy()
        if top + ih > h or left + iw > w:
            raise ValueError("GIF image extends past the logical screen")
        canvas[top : top + ih, left : left + iw] = frame
        return canvas
    raise ValueError("GIF has no image block")


def _lzw_decode(data: bytes, min_code: int, expect: int) -> list[int]:
    """GIF variable-width LZW (LSB-first bit packing)."""
    clear = 1 << min_code
    eoi = clear + 1
    acc = 0
    nacc = 0
    di = 0
    width = min_code + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple[int, ...] | None = None

    def read() -> int:
        nonlocal acc, nacc, di
        while nacc < width:
            if di >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[di] << nacc
            nacc += 8
            di += 1
        v = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        return v

    while len(out) < expect:
        code = read()
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"invalid GIF LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError(f"invalid GIF LZW code {code}")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError(
            f"GIF pixel data short: {len(out)} of {expect} indices"
        )
    return out[:expect]


# --------------------------------------------------------------- JPEG
# Sequential DCT JPEG (ITU-T T.81, public spec), pure numpy/stdlib.
# Scope: 8-bit baseline (SOF0/SOF1), 12-bit extended (SOF1) AND progressive (SOF2 — spectral
# selection, successive approximation, EOB runs), 1 or 3 components,
# sampling factors 1–2 (4:4:4 and 4:2:0), JFIF color math.
# Restart intervals (DRI) decode and encode in both modes; 12-bit
# samples decode and encode in both modes (SOF1 extended sequential
# AND SOF2 progressive — round-12); arithmetic coding raises
# NotImplementedError NAMING the feature.  The decoder reads
# quant/huffman tables FROM THE FILE (real-world interop does not
# depend on the encoder's built-in tables); the encoder embeds the
# Annex-K tables, producing legal baseline JPEGs any decoder reads.
# Entropy decode is a per-symbol Python loop — correctness-first; the
# engine decodes media inside Arrow-batched mapInPandas where
# per-asset decode cost is the accepted trade (operators/multimodal).

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex-K huffman specs: (bits[1..16], values)
_HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                   list(range(12)))
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T (T @ T.T = I): forward
    F = T·f·Tᵀ, inverse f = Tᵀ·F·T."""
    x = np.arange(8)
    u = x[:, None]
    t = 0.5 * np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    t[0, :] = 1 / (2 * np.sqrt(2.0))
    return t


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG huffman assignment: value → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — the decode-side map."""
    return {
        (ln, code): sym
        for sym, (code, ln) in _huff_codes(bits, values).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1-bits


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (category, appended bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(
    pixels: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    precision: int = 8,
    interleave: bool = True,
) -> bytes:
    """(H, W, 3) uint8 RGB — or (H, W) grayscale — → baseline JFIF
    JPEG bytes with the Annex-K quant/huffman tables (4:4:4, or 4:2:0
    when ``subsample``; grayscale is always single-component).
    ``restart_interval``: emit a DRI segment and an RSTn marker (with
    DC-predictor reset and byte alignment) every that-many MCUs — the
    error-resilience feature real camera files carry.
    ``precision=12``: EXTENDED sequential (SOF1) 12-bit samples —
    input values 0..4095 (uint16), 16-bit DQT entries, a DC table
    covering categories up to 15; decode keeps the high 8 bits
    (round-12 — the 12-bit gate closed for sequential mode).
    ``interleave=False``: emit one SOS PER COMPONENT (T.81
    non-interleaved order — data units in each component's own block
    raster), the multi-scan shape some encoders produce; pixel-exact
    with the interleaved encoding of the same input.
    ``interleave="partial"`` (round-13): the [Cb, Cr] pair in ONE
    MCU-interleaved scan on the frame-global grid plus Y in its own
    non-interleaved scan — the 2-of-3-component shape that was the
    decoder's last sequential scan gate."""
    if precision not in (8, 12):
        raise ValueError(f"JPEG precision {precision} (8 or 12)")
    arr = np.asarray(pixels, dtype=np.float64)
    mid = float(1 << (precision - 1))
    if arr.ndim == 2:
        return _encode_jpeg_planes(
            [arr], [(1, 1)], arr.shape[0], arr.shape[1],
            ri=restart_interval, prec=precision, interleave=interleave,
        )
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) or (H, W) uint8, got {arr.shape}")
    h, w, _ = arr.shape
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + mid,
        0.5 * r - 0.418688 * g - 0.081312 * b + mid,
    ]
    if subsample:
        hs = [(2, 2), (1, 1), (1, 1)]
        # pad to even dims then 2x2 box-average the chroma planes
        he, we = (h + 1) & ~1, (w + 1) & ~1
        for i in (1, 2):
            p = np.pad(planes[i], ((0, he - h), (0, we - w)), mode="edge")
            planes[i] = (
                p.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            )
    else:
        hs = [(1, 1), (1, 1), (1, 1)]
    return _encode_jpeg_planes(
        planes, hs, h, w, ri=restart_interval, prec=precision,
        interleave=interleave,
    )


def _encode_jpeg_planes(
    planes, hs, h: int, w: int, ri: int = 0, prec: int = 8,
    interleave: bool = True,
) -> bytes:
    """Shared entropy-encode + header assembly for 1 (grayscale) or 3
    (YCbCr) planes; component 0 uses the luma tables, the rest
    chroma."""
    ncomp = len(planes)
    hmax = max(f[0] for f in hs)
    vmax = max(f[1] for f in hs)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    T = _dct_matrix()
    qts = [_QT_LUMA] + [_QT_CHROMA] * (ncomp - 1)
    if prec == 12:
        # DC diffs reach category 15; the flat tables cover them (the
        # Annex-K 8-bit tables stop at 11/size-10)
        dc_codes = [_huff_codes(*_HUFF_DC12)] * ncomp
        ac_codes = [_huff_codes(*_HUFF_AC_PROG)] * ncomp
    else:
        dc_codes = [_huff_codes(*_HUFF_DC_LUMA)] + [
            _huff_codes(*_HUFF_DC_CHROMA)
        ] * (ncomp - 1)
        ac_codes = [_huff_codes(*_HUFF_AC_LUMA)] + [
            _huff_codes(*_HUFF_AC_CHROMA)
        ] * (ncomp - 1)

    def enc_block(bw, blk, qt, dcc, acc, pred: int) -> int:
        coef = T @ blk @ T.T
        q = np.round(coef / qt).astype(np.int64)
        zz = q.flatten()[_ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s, mb = _mag_bits(diff)
        c, ln = dcc[s]
        bw.write(c, ln)
        if s:
            bw.write(mb, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = acc[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            s, mb = _mag_bits(v)
            c, ln = acc[(run << 4) | s]
            bw.write(c, ln)
            bw.write(mb, s)
            run = 0
        if run:
            c, ln = acc[0x00]  # EOB
            bw.write(c, ln)
        return pred

    mid = float(1 << (prec - 1))
    # entropy-coded scans: [(component list, bytes)] — ONE scan listing
    # every component (interleaved MCU order), one scan PER component
    # (round-12 non-interleaved: data units in the component's own
    # block raster, per-scan DC pred + RSTn counters), or the
    # round-13 PARTIAL split ([Y] non-interleaved + [Cb, Cr]
    # MCU-interleaved on the frame-global grid)
    scans: list[tuple[list[int], bytes]] = []

    def write_interleaved(cis: list[int]) -> bytes:
        padded = {}
        for ci in cis:
            hf, vf = hs[ci]
            need_h = mcus_y * vf * 8
            need_w = mcus_x * hf * 8
            ph, pw = planes[ci].shape
            padded[ci] = np.pad(
                planes[ci], ((0, need_h - ph), (0, need_w - pw)),
                mode="edge",
            ) - mid
        bw = _BitWriter()
        pred = {ci: 0 for ci in cis}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                mcu = my * mcus_x + mx
                if ri and mcu and mcu % ri == 0:
                    bw.flush()  # pad to the byte edge with 1-bits (spec)
                    bw.buf += bytes([0xFF, 0xD0 + (mcu // ri - 1) % 8])
                    pred = {ci: 0 for ci in cis}
                for ci in cis:
                    hf, vf = hs[ci]
                    for by in range(vf):
                        for bx in range(hf):
                            y0 = (my * vf + by) * 8
                            x0 = (mx * hf + bx) * 8
                            pred[ci] = enc_block(
                                bw,
                                padded[ci][y0 : y0 + 8, x0 : x0 + 8],
                                qts[ci],
                                dc_codes[ci],
                                ac_codes[ci],
                                pred[ci],
                            )
        bw.flush()
        return bytes(bw.buf)

    if interleave == "partial" and ncomp == 3:
        scans.append(([1, 2], write_interleaved([1, 2])))
        noninterleaved = [0]  # Y gets its own one-component scan below
    elif interleave is True or interleave == "partial" or ncomp == 1:
        scans.append((list(range(ncomp)), write_interleaved(list(range(ncomp)))))
        noninterleaved = []
    else:
        noninterleaved = list(range(ncomp))
    for ci in noninterleaved:
        hf, vf = hs[ci]
        cw = -(-w * hf // hmax)
        chh = -(-h * vf // vmax)
        bw_c, bh_c = -(-cw // 8), -(-chh // 8)
        ph, pw = planes[ci].shape
        plane = (
            np.pad(
                planes[ci],
                ((0, bh_c * 8 - ph), (0, bw_c * 8 - pw)),
                mode="edge",
            )
            - mid
        )
        bw = _BitWriter()
        pred0 = 0
        for i in range(bh_c * bw_c):
            if ri and i and i % ri == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + (i // ri - 1) % 8])
                pred0 = 0
            by, bx = divmod(i, bw_c)
            pred0 = enc_block(
                bw,
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                qts[ci],
                dc_codes[ci],
                ac_codes[ci],
                pred0,
            )
        bw.flush()
        scans.append(([ci], bytes(bw.buf)))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qtabs = [(0, _QT_LUMA)] + ([(1, _QT_CHROMA)] if ncomp > 1 else [])
    for tid, qt in qtabs:
        if prec == 12:  # 16-bit DQT entries (pq=1), exercising that parse
            out += seg(
                0xDB,
                bytes([0x10 | tid])
                + b"".join(
                    struct.pack(">H", int(x))
                    for x in qt.flatten()[_ZIGZAG]
                ),
            )
        else:
            out += seg(
                0xDB,
                bytes([tid]) + bytes(int(x) for x in qt.flatten()[_ZIGZAG]),
            )
    sof = bytearray([prec]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hf, vf = hs[ci]
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    # 12-bit is extended sequential: SOF1
    out += seg(0xC1 if prec == 12 else 0xC0, bytes(sof))
    if prec == 12:
        htabs = [(0x00, _HUFF_DC12), (0x10, _HUFF_AC_PROG)]
        if ncomp > 1:
            htabs += [(0x01, _HUFF_DC12), (0x11, _HUFF_AC_PROG)]
    else:
        htabs = [(0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA)]
        if ncomp > 1:
            htabs += [(0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_CHROMA)]
    for tc_th, spec in htabs:
        bits, vals = spec
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))
    for comp_ids, entropy in scans:
        sos = bytearray([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, bytes(sos))
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# DC table covering categories 0..15 for 12-BIT sequential scans
# (Annex-K DC tables stop at category 11): 15 symbols at 4 bits + 1 at
# 5 — Kraft 15/16 + 1/32 < 1, canonical assignment leaves the all-ones
# code unused as the spec requires.
_HUFF_DC12 = (
    [0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(16)),
)


# Flat AC table for PROGRESSIVE scans: all 256 run/size symbols at 9–10
# bits (Kraft-valid canonical assignment, no all-ones code).  Baseline
# Annex-K AC tables lack the EOBn symbols (0x10..0xE0) progressive
# EOBRUN coding needs; since JPEG tables travel IN the file, a
# self-contained flat table is simpler than an optimizer.
_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(255)) + [255],
)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    dc_successive: bool = False,
    ac_successive: bool = False,
    sa_levels: int = 1,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """(H, W, 3) uint8 RGB — or (H, W) grayscale — → PROGRESSIVE JPEG
    (SOF2) bytes: spectral selection with a DC-first scan script
    (DC interleaved; AC bands 1–5 then 6–63 per component, Al=0)
    and real EOBRUN coding across all-zero bands.  With
    ``dc_successive`` the DC arrives in TWO scans — a first pass at
    Al=1 (high bits) and an Ah=1 refinement delivering the low bit per
    block — exercising the decoder's successive-approximation path.
    4:4:4 only — the point is generating REAL multi-scan progressive
    streams for the decoder's tests, mirroring encode_png/encode_bmp.
    ``restart_interval``: emit DRI + sequence-correct RSTn markers
    every N data units in the DC scans (first and refinement) and the
    AC first scans — predictors reset, EOB runs flushed BEFORE the
    boundary per spec; not combined with ``ac_successive`` (the
    refinement scan's lookahead EOBn folding would need boundary
    splitting this test encoder doesn't attempt — the DECODER handles
    that combination via the shared restart machinery)."""
    if restart_interval and ac_successive:
        raise ValueError(
            "restart_interval with ac_successive is not supported by "
            "this test encoder (decoder supports it)"
        )
    if precision not in (8, 12):
        raise ValueError(f"JPEG precision {precision} (8 or 12)")
    mid = float(1 << (precision - 1))
    arr = np.asarray(pixels, dtype=np.float64)
    if arr.ndim == 2:
        planes = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + mid,
            0.5 * r - 0.418688 * g - 0.081312 * b + mid,
        ]
    else:
        raise ValueError(f"expected (H, W, 3) or (H, W), got {arr.shape}")
    h, w = planes[0].shape
    ncomp = len(planes)
    bh, bw_ = -(-h // 8), -(-w // 8)
    T = _dct_matrix()
    qts = [_QT_LUMA] + [_QT_CHROMA] * (ncomp - 1)
    # zigzag coefficient blocks per component, raster block order
    zzs = []
    for ci, plane in enumerate(planes):
        p = np.pad(
            plane, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge"
        ) - mid
        blocks = np.empty((bh * bw_, 64), np.int64)
        for by in range(bh):
            for bx in range(bw_):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                q = np.round((T @ blk @ T.T) / qts[ci]).astype(np.int64)
                blocks[by * bw_ + bx] = q.flatten()[_ZIGZAG]
        zzs.append(blocks)

    if precision == 12:
        # DC diffs reach category 15 (the 12-bit sequential precedent)
        dc_codes = [_huff_codes(*_HUFF_DC12)] * ncomp
    else:
        dc_codes = [_huff_codes(*_HUFF_DC_LUMA)] + [
            _huff_codes(*_HUFF_DC_CHROMA)
        ] * (ncomp - 1)
    ac_prog = _huff_codes(*_HUFF_AC_PROG)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qtabs = [(0, _QT_LUMA)] + ([(1, _QT_CHROMA)] if ncomp > 1 else [])
    for tid, qt in qtabs:
        if precision == 12:  # 16-bit DQT entries (pq=1)
            out += seg(
                0xDB,
                bytes([0x10 | tid])
                + b"".join(
                    struct.pack(">H", int(x))
                    for x in qt.flatten()[_ZIGZAG]
                ),
            )
        else:
            out += seg(
                0xDB,
                bytes([tid]) + bytes(int(x) for x in qt.flatten()[_ZIGZAG]),
            )
    sof = bytearray([precision]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, bytes(sof))
    if precision == 12:
        htabs = [(0x00, _HUFF_DC12), (0x10, _HUFF_AC_PROG)]
        if ncomp > 1:
            htabs += [(0x01, _HUFF_DC12), (0x11, _HUFF_AC_PROG)]
    else:
        htabs = [(0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_PROG)]
        if ncomp > 1:
            htabs += [(0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_PROG)]
    for tc_th, spec_ in htabs:
        bits, vals = spec_
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def rst_boundary(bwr, unit: int, on_reset=None) -> None:
        """At a restart boundary: byte-align (1-pad), emit the
        sequence-correct RSTn, run the scan's state reset."""
        if not restart_interval or unit == 0 or unit % restart_interval:
            return
        bwr.flush()
        bwr.buf += bytes(
            [0xFF, 0xD0 + (unit // restart_interval - 1) % 8]
        )
        if on_reset is not None:
            on_reset()

    # scan 1: DC, all components interleaved (1x1 → one block per MCU);
    # with dc_successive the first pass codes dc >> 1 at Al=1
    al0 = 1 if dc_successive else 0
    bwr = _BitWriter()
    pred = [0] * ncomp
    for bi in range(bh * bw_):
        rst_boundary(
            bwr, bi,
            lambda: pred.__setitem__(slice(None), [0] * ncomp),
        )
        for ci in range(ncomp):
            v = int(zzs[ci][bi, 0]) >> al0
            diff = v - pred[ci]
            pred[ci] = v
            s, mb = _mag_bits(diff)
            c, ln = dc_codes[ci][s]
            bwr.write(c, ln)
            if s:
                bwr.write(mb, s)
    bwr.flush()
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (0 if ci == 0 else 1) << 4])
    sos += bytes([0, 0, al0])
    out += seg(0xDA, bytes(sos)) + bwr.buf

    if dc_successive:
        # DC refinement: Ah=1, Al=0 — one raw bit (the dc low bit) per
        # block in the same interleaved order
        bwr = _BitWriter()
        for bi in range(bh * bw_):
            rst_boundary(bwr, bi)  # no predictor state in refinement
            for ci in range(ncomp):
                bwr.write(int(zzs[ci][bi, 0]) & 1, 1)
        bwr.flush()
        sos = bytearray([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0])
        sos += bytes([0, 0, 0x10])  # Ss=0 Se=0 Ah=1 Al=0
        out += seg(0xDA, bytes(sos)) + bwr.buf

    # AC scans: per component.  Plain mode: bands (1-5) then (6-63) at
    # Al=0.  ac_successive mode: one band (1-63) FIRST PASS at Al=1
    # (point transform truncates toward zero, T.81 — NOT an arithmetic
    # shift on negatives) followed by the Ah=1 refinement scan with
    # buffered correction bits riding the EOB runs.
    def ac_first(ci, ss, se, al):
        bwr = _BitWriter()
        eobrun = 0

        def flush():
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            c, ln = ac_prog[r << 4]
            bwr.write(c, ln)
            if r:
                bwr.write(eobrun - (1 << r), r)
            eobrun = 0

        for bi in range(bh * bw_):
            if restart_interval and bi and bi % restart_interval == 0:
                flush()  # an EOB run may not cross a restart (spec)
                rst_boundary(bwr, bi)
            band = [
                (1 if v > 0 else -1) * (abs(int(v)) >> al)
                for v in zzs[ci][bi, ss : se + 1]
            ]
            nz = [i for i, v in enumerate(band) if v]
            if not nz:
                eobrun += 1
                if eobrun == 32767:
                    flush()
                continue
            flush()
            last = -1
            for idx in nz:
                run = idx - last - 1
                while run > 15:
                    c, ln = ac_prog[0xF0]
                    bwr.write(c, ln)
                    run -= 16
                s, mb = _mag_bits(band[idx])
                c, ln = ac_prog[(run << 4) | s]
                bwr.write(c, ln)
                bwr.write(mb, s)
                last = idx
            if last < se - ss:
                eobrun = 1  # this block's EOB, absorbs following
        flush()
        bwr.flush()
        return bwr.buf

    def ac_refine(ci, ss, se, al):
        """T.81 G refinement encode as a DECODER MIRROR: symbols and
        correction bits are emitted in exactly the order the refinement
        decode walk consumes them — newly-significant coefficients
        (|v|>>al == 1) emit (zero-history-run<<4|1)+sign and then the
        inline history bits of the positions walked over; ZRLs cover 16
        zero-history positions each with their interleaved history
        bits; a block's trailing band folds into an EOBn (count looked
        ahead over following significant-free blocks) followed by the
        terminating block's tail bits and each run block's full-band
        bits, block-ordered."""
        bwr = _BitWriter()
        n_blocks = bh * bw_
        bands = [
            [int(v) for v in zzs[ci][bi, ss : se + 1]]
            for bi in range(n_blocks)
        ]
        absv = [[abs(v) >> al for v in b] for b in bands]
        hist_bit = lambda v: (abs(v) >> al) & 1  # noqa: E731

        def emit_eobn(count):
            r = count.bit_length() - 1
            c, ln = ac_prog[r << 4]
            bwr.write(c, ln)
            if r:
                bwr.write(count - (1 << r), r)

        def emit_hist_range(bi, i0, i1):
            for i in range(i0, i1 + 1):
                if absv[bi][i] > 1:
                    bwr.write(hist_bit(bands[bi][i]), 1)

        bi = 0
        while bi < n_blocks:
            sig = [i for i, a in enumerate(absv[bi]) if a == 1]
            i = 0  # walk position within the band
            for sp in sig:
                # zero-history run before this newly-significant coef
                r = sum(1 for j in range(i, sp) if absv[bi][j] == 0)
                while r > 15:
                    c, ln = ac_prog[0xF0]
                    bwr.write(c, ln)
                    # the ZRL walk passes 16 zero-history positions,
                    # emitting interleaved history bits
                    passed = 0
                    while passed < 16:
                        if absv[bi][i] == 0:
                            passed += 1
                        else:
                            bwr.write(hist_bit(bands[bi][i]), 1)
                        i += 1
                    r -= 16
                c, ln = ac_prog[(r << 4) | 1]
                bwr.write(c, ln)
                bwr.write(1 if bands[bi][sp] > 0 else 0, 1)
                emit_hist_range(bi, i, sp - 1)
                i = sp + 1
            if i <= se - ss:
                # trailing band: EOBn over this block + following
                # significant-free blocks
                run = 1
                while bi + run < n_blocks and not any(
                    a == 1 for a in absv[bi + run]
                ) and run < 32767:
                    run += 1
                emit_eobn(run)
                emit_hist_range(bi, i, se - ss)
                for j in range(bi + 1, bi + run):
                    emit_hist_range(j, 0, se - ss)
                bi += run
                continue
            bi += 1
        bwr.flush()
        return bwr.buf

    for ci in range(ncomp):
        if ac_successive:
            sos = bytes([1, ci + 1, (0 if ci == 0 else 1) << 4, 1, 63,
                         sa_levels])  # Ah=0 Al=sa_levels
            out += seg(0xDA, sos) + ac_first(ci, 1, 63, sa_levels)
        else:
            for ss, se in ((1, 5), (6, 63)):
                sos = bytes(
                    [1, ci + 1, (0 if ci == 0 else 1) << 4, ss, se, 0]
                )
                out += seg(0xDA, sos) + ac_first(ci, ss, se, 0)
    if ac_successive:
        # refinement CHAIN, one bit plane per scan (the libjpeg-style
        # script shape): Ah=l+1, Al=l for l = sa_levels-1 .. 0
        for lvl in range(sa_levels - 1, -1, -1):
            for ci in range(ncomp):
                sos = bytes([1, ci + 1, (0 if ci == 0 else 1) << 4, 1, 63,
                             ((lvl + 1) << 4) | lvl])
                out += seg(0xDA, sos) + ac_refine(ci, 1, 63, lvl)
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte-unstuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated at FF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} in entropy data"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> int:
        """Consume an RSTn marker at a restart boundary: drop the
        pad bits to the byte edge, require 0xFFD0-D7, return n (the
        caller checks the mod-8 sequence per T.81)."""
        self._n = 0  # discard pad bits
        if self.pos + 1 >= len(self.data):
            raise ValueError("JPEG truncated at restart marker")
        if self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError(
                "expected RSTn restart marker at interval boundary, got "
                f"0x{self.data[self.pos]:02X}{self.data[self.pos + 1]:02X}"
            )
        n = self.data[self.pos + 1] & 7
        self.pos += 2
        return n

    def symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


def _extend(v: int, s: int) -> int:
    """Inverse magnitude coding (T.81 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline/extended-sequential JPEG bytes → (H, W, 3) uint8 RGB
    (grayscale replicated).

    Tables come FROM THE FILE; sampling factors 1–2 supported (chroma
    upsampled by replication); progressive (SOF2), 12-bit (SOF1),
    restart intervals, NON-INTERLEAVED one-component-per-SOS scans
    (round-12) and PARTIAL interleaved scans (any component subset
    per SOS on the frame-global MCU grid — round-13) all decode.
    Arithmetic/lossless SOFs raise NotImplementedError naming the
    feature; structural corruption raises ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[int, dict[tuple[int, int], int]] = {}
    sof = None
    ri = 0
    got: dict[int, np.ndarray] = {}  # non-interleaved planes by comp id
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # TEM / RSTn: parameterless
            continue
        if pos + 4 > len(payload):
            raise ValueError("JPEG truncated in marker segment")
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                q = np.zeros(64, np.int64)
                if pq == 0:
                    q[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, o + 1)
                    o += 65
                elif pq == 1:  # 16-bit entries (12-bit streams use them)
                    q[_ZIGZAG] = np.frombuffer(
                        body, ">u2", 64, o + 1
                    ).astype(np.int64)
                    o += 129
                else:
                    raise ValueError(f"JPEG DQT precision field {pq}")
                qts[tq] = q.reshape(8, 8)
        elif marker == 0xC4:
            o = 0
            while o < len(body):
                tc_th = body[o]
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                huff[tc_th] = _huff_lookup(bits, vals)
                o += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:
            prec = body[0]
            # 12-bit is EXTENDED sequential only (T.81 table B.2):
            # SOF0 must be 8-bit, SOF1 may be 8 or 12
            if prec not in ((8,) if marker == 0xC0 else (8, 12)):
                raise NotImplementedError(
                    f"{prec}-bit JPEG precision for SOF{marker - 0xC0}"
                )
            hh, ww = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            sof = (hh, ww, comps, prec)
        elif marker == 0xC2:
            return _decode_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (baseline SOF0/SOF1 and "
                "progressive SOF2 supported)"
            )
        elif marker == 0xDD:
            # round-12: the baseline DRI gate closed — restart interval
            # in MCUs (0 disables); the scan decoder byte-aligns,
            # checks the RSTn sequence and resets DC predictors
            ri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            if len(sof[2]) not in (1, 3):
                raise NotImplementedError(
                    f"JPEG with {len(sof[2])} components (only 1 "
                    "grayscale / 3 YCbCr; CMYK/YCCK unsupported)"
                )
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            data_start = pos + 2 + ln
            one_comp_needs_du_order = ns == 1 and (
                sof[2][0][1] > 1 or sof[2][0][2] > 1
            )
            if ns == len(sof[2]) and not one_comp_needs_du_order:
                end = payload.rfind(b"\xff\xd9")
                if end < 0:
                    raise ValueError("JPEG missing EOI")
                return _decode_scan(
                    payload[data_start:end], sof, scan, qts, huff, ri
                )
            if ns != 1:
                # round-13: PARTIAL interleaved scan (e.g. the common
                # [Y], [Cb, Cr] split) — MCU geometry is frame-global
                # (T.81 A.2.3) even for a component subset; planes
                # accumulate across scans like the non-interleaved
                # path (the gate this replaces)
                end = _entropy_end(payload, data_start)
                planes = _scan_planes(
                    payload[data_start:end], sof, scan, qts, huff, ri
                )
                for (cs, _, _), plane in zip(scan, planes):
                    got[cs] = plane
                if len(got) == len(sof[2]):
                    hh, ww, comps, prec = sof
                    return _jpeg_finish(
                        [got[c[0]] for c in comps],
                        [(c[1], c[2]) for c in comps],
                        max(c[1] for c in comps),
                        max(c[2] for c in comps),
                        hh,
                        ww,
                        prec,
                    )
                pos = end
                continue
            # round-12: NON-INTERLEAVED baseline — one component per
            # SOS; accumulate planes across scans (tables/DRI may be
            # redefined between them) and reconstruct once every SOF
            # component has arrived
            hh, ww, comps, prec = sof
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("JPEG sampling factors > 2")
            cs, td, ta = scan[0]
            try:
                hf, vf, tq = next(
                    (c[1], c[2], c[3]) for c in comps if c[0] == cs
                )
            except StopIteration:
                raise ValueError(f"JPEG scan component {cs} not in SOF")
            end = _entropy_end(payload, data_start)
            cw = -(-ww * hf // hmax)
            ch = -(-hh * vf // vmax)
            bw_c = -(-cw // 8)
            bh_c = -(-ch // 8)
            got[cs] = _decode_noninterleaved(
                payload[data_start:end],
                qts[tq],
                huff[td],
                huff[0x10 | ta],
                prec,
                ri,
                bh_c,
                bw_c,
            )
            if len(got) == len(comps):
                return _jpeg_finish(
                    [got[c[0]] for c in comps],
                    [(c[1], c[2]) for c in comps],
                    hmax,
                    vmax,
                    hh,
                    ww,
                    prec,
                )
            pos = end
            continue
        pos += 2 + ln
    if got:
        raise ValueError(
            f"JPEG non-interleaved stream ended with {len(got)} of "
            f"{len(sof[2])} component scans present"
        )
    raise ValueError("JPEG has no scan (SOS) segment")


def _entropy_end(payload: bytes, start: int) -> int:
    """Index of the first REAL marker after `start` (skips 0xFF00 byte
    stuffing, 0xFF fill bytes, AND RST0–RST7 — restart markers are
    part of the entropy segment, round-12) — where a progressive
    scan's entropy data ends."""
    i = start
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            if nxt == 0xFF:
                i += 1
                continue
            return i
        i += 1
    raise ValueError("JPEG truncated: entropy data reaches EOF")


def _decode_progressive(payload: bytes) -> np.ndarray:
    """Progressive (SOF2) JPEG → (H, W, 3) uint8 RGB.

    Coefficients accumulate across scans in per-component zigzag
    buffers; each SOS contributes its spectral band (Ss..Se) at its
    point-transform shift (<< Al).  Supported: interleaved and
    single-component DC scans with FULL successive approximation
    (first pass + refinement bits), single-component AC first scans at
    any Al with EOBRUN coding, AND AC successive-approximation
    REFINEMENT scans (T.81 G.1.2.3 — one more magnitude bit per
    already-nonzero coefficient read inline during the band walk,
    including for every block inside an EOB run; ±1<<Al for newly-
    significant ones) — the full progressive feature set.  Sampling
    factors 1–2, tables redefinable between scans.  Reconstruction
    (dequant → IDCT → upsample → color) happens once, at EOI."""
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[int, dict[tuple[int, int], int]] = {}
    sof = None
    ri = 0
    prec = 8
    coef: list[np.ndarray] = []
    grids: list[tuple[int, int, int, int]] = []  # (bh_pad, bw_pad, bh_c, bw_c)
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("JPEG truncated in marker segment")
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                q = np.zeros(64, np.int64)
                if pq == 0:
                    q[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, o + 1)
                    o += 65
                elif pq == 1:  # 16-bit entries (12-bit streams)
                    q[_ZIGZAG] = np.frombuffer(
                        body, ">u2", 64, o + 1
                    ).astype(np.int64)
                    o += 129
                else:
                    raise ValueError(f"JPEG DQT precision field {pq}")
                qts[tq] = q.reshape(8, 8)
        elif marker == 0xC4:
            o = 0
            while o < len(body):
                tc_th = body[o]
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                huff[tc_th] = _huff_lookup(bits, vals)
                o += 17 + nv
        elif marker == 0xC2:
            # round-12: 12-bit progressive closed (the last huffman
            # precision gate) — prec flows into the level shift and
            # the shared high-byte output via _jpeg_finish
            if body[0] not in (8, 12):
                raise NotImplementedError(f"{body[0]}-bit JPEG precision")
            prec = body[0]
            hh, ww = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"JPEG with {ncomp} components"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("JPEG sampling factors > 2")
            mcus_x = -(-ww // (8 * hmax))
            mcus_y = -(-hh // (8 * vmax))
            sof = (hh, ww, comps, hmax, vmax, mcus_x, mcus_y)
            for _, hf, vf, _tq in comps:
                bh_pad, bw_pad = mcus_y * vf, mcus_x * hf
                cw = -(-ww * hf // hmax)
                chh = -(-hh * vf // vmax)
                grids.append((bh_pad, bw_pad, -(-chh // 8), -(-cw // 8)))
                coef.append(np.zeros((bh_pad, bw_pad, 64), np.int64))
        elif marker == 0xDD:
            # round-12: progressive DRI decodes too — each scan walk
            # byte-aligns at its interval boundary, checks the RSTn
            # mod-8 sequence and resets its entropy state (DC
            # predictors / EOB run); DRI may be redefined between
            # scans, as the spec allows
            ri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            start = pos + 2 + ln
            end = _entropy_end(payload, start)
            _prog_scan(
                payload[start:end], sof, scan, ss, se, ah, al,
                coef, grids, huff, ri,
            )
            pos = end
            continue
        pos += 2 + ln
    if sof is None or not coef:
        raise ValueError("progressive JPEG has no frame/scan data")
    hh, ww, comps, hmax, vmax, _, _ = sof
    T = _dct_matrix()
    mid = float(1 << (prec - 1))
    planes = []
    for ci, (_cid, hf, vf, tq) in enumerate(comps):
        bh_pad, bw_pad, _, _ = grids[ci]
        qt = qts[tq]
        plane = np.empty((bh_pad * 8, bw_pad * 8), np.float64)
        for by in range(bh_pad):
            for bx in range(bw_pad):
                c64 = np.zeros(64, np.int64)
                c64[_ZIGZAG] = coef[ci][by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    T.T @ (c64.reshape(8, 8) * qt) @ T + mid
                )
        planes.append(plane)
    return _jpeg_finish(
        planes, [(c[1], c[2]) for c in comps], hmax, vmax, hh, ww, prec
    )


def _prog_scan(data, sof, scan, ss, se, ah, al, coef, grids, huff, ri=0):
    """Apply one progressive scan's entropy data to the coefficient
    buffers (T.81 G.2 decode procedures).  ``ri``: restart interval in
    MCUs (interleaved DC scans) / data units (single-component scans);
    at each boundary the reader byte-aligns onto a sequence-checked
    RSTn and the scan's entropy state resets — DC predictors here, the
    EOB run in the AC walks (an EOB run may not legally cross a
    restart; a stream that tries is reset, matching the common-decoder
    behavior, not rejected)."""
    hh, ww, comps, hmax, vmax, mcus_x, mcus_y = sof
    idx_by_id = {c[0]: i for i, c in enumerate(comps)}
    br = _BitReader(data)
    rst_seq = [0]

    def maybe_restart(unit: int) -> bool:
        """True exactly at interval boundaries (after consuming the
        marker and bumping the sequence) — callers reset their own
        entropy state on True."""
        if not ri or unit == 0 or unit % ri:
            return False
        n = br.restart()
        if n != rst_seq[0] % 8:
            raise ValueError(
                "JPEG restart marker out of sequence in progressive "
                f"scan: RST{n} where RST{rst_seq[0] % 8} expected"
            )
        rst_seq[0] += 1
        return True
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        members = [idx_by_id[cs] for cs, _td, _ta in scan]
        tables = {
            idx_by_id[cs]: huff.get(td) for cs, td, _ta in scan
        }
        if ah == 0 and any(
            tables[m] is None for m in members
        ):
            raise ValueError("progressive DC scan missing huffman table")
        pred = {m: 0 for m in members}

        def dc_unit(ci, by, bx):
            if ah == 0:
                s = br.symbol(tables[ci])
                if s:
                    pred[ci] += _extend(br.bits(s), s)
                coef[ci][by, bx, 0] = pred[ci] << al
            else:
                if br.bit():
                    # append the next lower bit (two's-complement OR
                    # is exact for values built by << Al shifts)
                    coef[ci][by, bx, 0] |= 1 << al

        if len(scan) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if maybe_restart(my * mcus_x + mx):
                        pred = {m: 0 for m in members}
                    for ci in members:
                        _cid, hf, vf, _tq = comps[ci]
                        for by in range(vf):
                            for bx in range(hf):
                                dc_unit(ci, my * vf + by, mx * hf + bx)
        else:
            ci = members[0]
            _, _, bh_c, bw_c = grids[ci]
            for by in range(bh_c):
                for bx in range(bw_c):
                    if maybe_restart(by * bw_c + bx):
                        pred = {m: 0 for m in members}
                    dc_unit(ci, by, bx)
        return
    # AC scan: single component by spec
    if len(scan) != 1:
        raise ValueError("progressive AC scan with multiple components")
    cs, _td, ta = scan[0]
    ci = idx_by_id[cs]
    act = huff.get(0x10 | ta)
    if act is None:
        raise ValueError("progressive AC scan missing huffman table")
    _, _, bh_c, bw_c = grids[ci]
    eobrun = 0
    if ah == 0:
        for by in range(bh_c):
            for bx in range(bw_c):
                if maybe_restart(by * bw_c + bx):
                    eobrun = 0
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.symbol(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                        break
                    k += r
                    if k > se:
                        raise ValueError("progressive AC index overflow")
                    coef[ci][by, bx, k] = _extend(br.bits(s), s) << al
                    k += 1
        return
    # AC successive-approximation REFINEMENT (T.81 G.1.2.3): one more
    # magnitude bit per already-nonzero coefficient (read inline while
    # walking the band — including for every block inside an EOB run)
    # and ±1<<Al for newly-significant ones.
    p1, m1 = 1 << al, -(1 << al)

    def refine_range(blk, k0, k1):
        for kk in range(k0, k1 + 1):
            c = blk[kk]
            if c:
                if br.bit() and (c & p1) == 0:
                    blk[kk] += p1 if c > 0 else m1

    for by in range(bh_c):
        for bx in range(bw_c):
            if maybe_restart(by * bw_c + bx):
                eobrun = 0
            blk = coef[ci][by, bx]
            if eobrun:
                refine_range(blk, ss, se)
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = br.symbol(act)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                        break
                    # ZRL: pass 16 zero-HISTORY positions
                else:
                    if s != 1:
                        raise ValueError(
                            "AC refinement coefficient size != 1"
                        )
                    val = p1 if br.bit() else m1
                while k <= se:
                    c = blk[k]
                    if c:
                        if br.bit() and (c & p1) == 0:
                            blk[k] += p1 if c > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
            if k <= se:
                # the block EOB terminated still refines its tail
                refine_range(blk, k, se)


def _read_block(br: "_BitReader", dct_, act_, pred: int):
    """Decode ONE sequential data unit: returns (zigzag int64[64] with
    the absolute DC already in slot 0, new DC predictor).  Shared by
    the interleaved MCU walk and the round-12 non-interleaved
    per-component walk."""
    zz = np.zeros(64, np.int64)
    s = br.symbol(dct_)
    if s:
        pred += _extend(br.bits(s), s)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = br.symbol(act_)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        sz = rs & 0xF
        if sz == 0:
            raise ValueError(
                f"invalid JPEG AC symbol 0x{rs:02X} "
                "(nonzero run with size 0)"
            )
        if k > 63:
            raise ValueError("JPEG AC index overflow")
        zz[k] = _extend(br.bits(sz), sz)
        k += 1
    return zz, pred


def _jpeg_finish(planes, factors, hmax, vmax, h, w, prec) -> np.ndarray:
    """Upsample-by-replication + crop + level handling + color
    transform shared by the interleaved and non-interleaved decode
    paths.  ``planes`` are spatial component planes (level-shifted
    back, i.e. mid already added) in SOF order."""
    full = []
    for (hf, vf), p in zip(factors, planes):
        if hf < hmax:
            p = p.repeat(hmax // hf, axis=1)
        if vf < vmax:
            p = p.repeat(vmax // vf, axis=0)
        full.append(p[:h, :w])
    mid = 1 << (prec - 1)

    # 12-bit: clip in the 12-bit domain, keep the HIGH 8 bits (the
    # PNG-16 high-byte convention)
    def out8(a):
        v = np.clip(np.round(a), 0, (1 << prec) - 1).astype(np.int64)
        return (v >> (prec - 8)).astype(np.uint8)

    if len(full) == 1:
        y = out8(full[0])
        return np.repeat(y[..., None], 3, axis=2)
    y, cb, cr = full[0], full[1] - float(mid), full[2] - float(mid)
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return out8(rgb)


def _scan_planes(data, sof, scan, qts, huff, ri: int = 0) -> list:
    """Decode ONE MCU-interleaved scan (any subset of the frame's
    components — T.81 A.2.3: the MCU grid derives from the FRAME
    dimensions and the frame-wide hmax/vmax even when the scan lists
    fewer components) into spatial planes, scan order."""
    h, w, comps, prec = sof
    mid = 1 << (prec - 1)  # level shift: 128 (8-bit) / 2048 (12-bit)
    by_id = {cid: (hf, vf, tq) for cid, hf, vf, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("JPEG sampling factors > 2")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    T = _dct_matrix()
    planes = []
    meta = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG scan component {cs} not in SOF")
        hf, vf, tq = by_id[cs]
        planes.append(
            np.zeros((mcus_y * vf * 8, mcus_x * hf * 8), np.float64)
        )
        meta.append((hf, vf, qts[tq], huff[td], huff[0x10 | ta]))
    br = _BitReader(data)
    pred = [0] * len(scan)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu = my * mcus_x + mx
            if ri and mcu and mcu % ri == 0:
                n = br.restart()
                if n != (mcu // ri - 1) % 8:
                    raise ValueError(
                        f"JPEG restart marker out of sequence: RST{n} "
                        f"where RST{(mcu // ri - 1) % 8} expected"
                    )
                pred = [0] * len(scan)
            for ci, (hf, vf, qt, dct_, act_) in enumerate(meta):
                for by in range(vf):
                    for bx in range(hf):
                        zz, pred[ci] = _read_block(br, dct_, act_, pred[ci])
                        coef = np.zeros(64, np.int64)
                        coef[_ZIGZAG] = zz
                        blk = T.T @ (coef.reshape(8, 8) * qt) @ T
                        y0 = (my * vf + by) * 8
                        x0 = (mx * hf + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk + mid
    return planes


def _decode_scan(data, sof, scan, qts, huff, ri: int = 0) -> np.ndarray:
    h, w, comps, prec = sof
    by_id = {cid: (hf, vf) for cid, hf, vf, _ in comps}
    planes = _scan_planes(data, sof, scan, qts, huff, ri)
    return _jpeg_finish(
        planes,
        [by_id[cs] for cs, _, _ in scan],
        max(c[1] for c in comps),
        max(c[2] for c in comps),
        h,
        w,
        prec,
    )


def _decode_noninterleaved(
    data: bytes, qt, dct_, act_, prec: int, ri: int, bh_c: int, bw_c: int
) -> np.ndarray:
    """Round-12: decode ONE component's non-interleaved sequential
    scan — data units in the component's own raster order over its
    ACTUAL block grid (T.81 F.2.2: ceil of the scaled component dims,
    never the MCU-padded grid), each data unit its own restart-counted
    MCU, RSTn sequence and DC predictor reset per the interleaved
    rules."""
    T = _dct_matrix()
    mid = 1 << (prec - 1)
    plane = np.zeros((bh_c * 8, bw_c * 8), np.float64)
    br = _BitReader(data)
    pred = 0
    for i in range(bh_c * bw_c):
        if ri and i and i % ri == 0:
            n = br.restart()
            if n != (i // ri - 1) % 8:
                raise ValueError(
                    f"JPEG restart marker out of sequence: RST{n} "
                    f"where RST{(i // ri - 1) % 8} expected"
                )
            pred = 0
        zz, pred = _read_block(br, dct_, act_, pred)
        coef = np.zeros(64, np.int64)
        coef[_ZIGZAG] = zz
        by, bx = divmod(i, bw_c)
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            T.T @ (coef.reshape(8, 8) * qt) @ T + mid
        )
    return plane


# --------------------------------------------------------------- TIFF
# Baseline TIFF 6.0 (Adobe public spec), pure numpy/stdlib.  Scope:
# grayscale (photometric 0/1) at 1/4/8/16 bits, RGB at 8/16 bits
# (16-bit output keeps the high byte, both byte orders), PALETTE
# color (photometric 3, ColorMap tag 320), BOTH strip and TILE
# organizations (§15 tile grids, tags 322-325), planar configuration
# 2 (per-plane strip sequences), compression none (1) / LZW (5, with
# the TIFF early-change variant and horizontal-differencing
# predictor 2 at 8/16 bits) / Deflate (8 and legacy 32946 — zlib
# segments) / PackBits (32773) / the CCITT bilevel family (2 = per-line
# modified Huffman, 3 = T.4/G3 with EOLs in 1-D and 2-D T4Options
# modes, 4 = T.6/G4 MMR — round-14) / NEW-STYLE JPEG (7, TIFF-EP /
# Technical Note 2 — round-15: per-strip/tile abbreviated JPEG
# streams through the in-house T.81 codec, shared DQT/DHT via the
# JPEGTables tag 347, photometric 6 YCbCr and 1/0 grayscale) — all
# axes round-trip-tested.  The remaining exotic compressions
# (old-style JPEG 6, JBIG, JPEG2000), depths outside 1/4/8/16 and the
# residual combos raise NotImplementedError naming the feature (the
# authoritative list is the GATES registry at the top); structural
# corruption raises ValueError.


def _tiff_lzw_decode(data: bytes, expect: int) -> bytearray:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing over a
    fixed 256-symbol byte alphabet, ClearCode 256 / EOI 257, and the
    EARLY code-width bump — width grows when the table reaches
    2^w − 1 entries, ONE code earlier than GIF's variant (the
    classic interop trap; the GIF decoder above is LSB-first without
    it)."""
    acc = 0
    nacc = 0
    di = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    def read() -> int:
        nonlocal acc, nacc, di
        while nacc < width:
            if di >= len(data):
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[di]
            nacc += 8
            di += 1
        nacc -= width
        v = (acc >> nacc) & ((1 << width) - 1)
        acc &= (1 << nacc) - 1
        return v

    while len(out) < expect:
        code = read()
        if code == 256:  # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            if code >= 256:
                raise ValueError(f"invalid TIFF LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"invalid TIFF LZW code {code}")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError(
            f"TIFF strip short: {len(out)} of {expect} bytes"
        )
    del out[expect:]
    return out


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Encoder twin of :func:`_tiff_lzw_decode` — same early-change
    schedule (width bumps when the just-assigned code reaches
    2^w − 1), table reset at 4094 entries per the spec."""
    out = bytearray()
    acc = 0
    nacc = 0

    def write(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
            acc &= (1 << nacc) - 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    width = 9
    write(256, width)  # leading Clear, as the spec requires
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        write(table[cur], width)
        table[nxt] = next_code
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        next_code += 1
        if next_code >= 4094:
            write(256, width)
            table = fresh()
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        write(table[cur], width)
    write(257, width)  # EOI
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytearray:
    """PackBits RLE (TIFF 6.0 §9): n∈[0,127] → n+1 literals,
    n∈[-127,-1] → next byte repeated 1−n times, −128 is a no-op."""
    out = bytearray()
    i = 0
    while len(out) < expect:
        if i >= len(data):
            raise ValueError("TIFF PackBits stream truncated")
        n = data[i]
        i += 1
        if n == 128:
            continue
        if n < 128:
            if i + n + 1 > len(data):
                raise ValueError("TIFF PackBits literal truncated")
            out += data[i : i + n + 1]
            i += n + 1
        else:
            if i >= len(data):
                raise ValueError("TIFF PackBits run truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    del out[expect:]
    return out


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of ≥3 as replicates, the rest as
    literals (the reference strategy in the spec's sample code)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        while (
            j < n
            and j - i < 128
            and not (
                j + 2 < n and data[j] == data[j + 1] == data[j + 2]
            )
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}

#: per-byte bit reversal (FillOrder 2 ↔ 1 conversion)
_BITREV = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], np.uint8
)



# ----------------------------------------------------- TIFF CCITT G4
# ITU-T T.6 (Group 4 / MMR) bilevel coding, round-14: the verdict
# ranked CCITT Group 4 fax the likeliest remaining real-world TIFF
# gate (scanned-document corpora).  Pure-Python per-RUN (not per-pixel)
# 2-D coding against the reference line, with the public T.4 modified
# Huffman run-length tables (terminating 0-63, makeup 64-1728 per
# color, extended makeup 1792-2560 shared).  Table integrity is pinned
# three ways in tests/test_codecs.py: a prefix-freeness sweep over
# every (mode ∪ runs) code set, hand-assembled spec vectors (an
# all-white row IS the single bit V0=1; an all-black 8-px row IS
# 001+white0+black8), and encoder↔decoder round-trips across strip /
# tile / byte-order / ragged-width matrices.  Sample semantics: a
# WHITE run decodes to sample value 0 (the fax convention —
# photometric 0 renders it white via the standard inversion);
# extension codes (uncompressed mode) are a named gate.

_T4_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
}
_T4_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}
_T4_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}
_T4_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
_T4_EXT_MAKEUP = {  # shared by both colors (T.4 table 3)
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}


def _t4_decode_map(color: int) -> dict[str, int]:
    """bitstring → run length for one color (terminating + makeup +
    extended makeup); built once, cached on the function."""
    cache = getattr(_t4_decode_map, "_cache", None)
    if cache is None:
        cache = {}
        for c, (term, mk) in enumerate(
            ((_T4_WHITE_TERM, _T4_WHITE_MAKEUP),
             (_T4_BLACK_TERM, _T4_BLACK_MAKEUP))
        ):
            m = {}
            for run, code in term.items():
                m[code] = run
            for run, code in mk.items():
                m[code] = run
            for run, code in _T4_EXT_MAKEUP.items():
                m[code] = run
            cache[c] = m
        _t4_decode_map._cache = cache
    return cache[color]


class _Bits:
    """MSB-first bit cursor over bytes (TIFF FillOrder 1)."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def take(self) -> int:
        if self.pos >= self.n:
            raise ValueError("CCITT G4 stream exhausted mid-code")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b


def _g4_read_run(bits: _Bits, color: int) -> int:
    """One T.4 run length (zero or more makeups + one terminating)."""
    table = _t4_decode_map(color)
    total = 0
    while True:
        code = ""
        val = None
        for _ in range(14):  # longest T.4 code is 13 bits
            code += "01"[bits.take()]
            val = table.get(code)
            if val is not None:
                break
        if val is None:
            raise ValueError(f"CCITT G4 bad run code {code!r}")
        total += val
        if val < 64:  # terminating code ends the run
            return total


def _ccitt_2d_line_decode(bits: _Bits, ref: list[int], width: int) -> list[int]:
    """Decode ONE 2-D-coded line (shared by T.6/G4 and T.4/G3 2-D
    lines — the mode alphabet and b1/b2 resolution are identical) →
    the line's transition list (even index = white→black).  ``ref`` is
    the reference line's transitions padded with two ``width``
    sentinels.  Extension codes (0000001…, uncompressed mode) raise
    NotImplementedError (registry slug tiff-g4-extension)."""
    import bisect

    curt: list[int] = []
    a0 = -1
    color = 0  # 0 = white, 1 = black
    while a0 < width:
        # b1: first reference transition > a0 flipping TO the color
        # opposite the current one (even index = white→black)
        i = bisect.bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        # mode code: walk the prefix tree bit by bit
        if bits.take():  # 1 → V0
            a1 = b1
            mode = "v"
        elif bits.take():  # 01x
            a1 = b1 + 1 if bits.take() else b1 - 1  # 011/010
            mode = "v"
        elif bits.take():  # 001 → horizontal
            mode = "h"
        elif bits.take():  # 0001 → pass
            mode = "p"
        elif bits.take():  # 00001x
            a1 = b1 + 2 if bits.take() else b1 - 2
            mode = "v"
        elif bits.take():  # 000001x
            a1 = b1 + 3 if bits.take() else b1 - 3
            mode = "v"
        elif bits.take():  # 0000001 → 2-D extensions
            raise NotImplementedError(
                "CCITT 2-D extension code (uncompressed mode)"
            )
        else:  # ≥ 7 zeros: EOL/EOFB — illegal mid-line
            raise ValueError("CCITT premature EOL/EOFB inside a 2-D line")
        if mode == "p":
            a0 = b2
            continue
        if mode == "h":
            r1 = _g4_read_run(bits, color)
            r2 = _g4_read_run(bits, 1 - color)
            a1 = (a0 if a0 > 0 else 0) + r1
            a2 = a1 + r2
            if a2 > width or a1 > width:
                raise ValueError("CCITT horizontal run overruns row")
            curt.extend((a1, a2))
            a0 = a2
            continue
        # vertical
        if a1 < 0 or a1 > width:
            raise ValueError("CCITT vertical move out of row")
        curt.append(a1)
        a0 = a1
        color ^= 1
    if len(curt) & 1:
        curt.append(width)
    return curt


def _ccitt_1d_line_decode(bits: _Bits, width: int) -> list[int]:
    """Decode ONE 1-D (modified-Huffman) line → transition list:
    alternating runs starting WHITE (a black-first row begins with the
    white run-length-0 code), each run a T.4 makeup/terminating
    sequence, until the runs sum to exactly ``width``."""
    curt: list[int] = []
    pos = 0
    color = 0
    while pos < width:
        run = _g4_read_run(bits, color)
        pos += run
        if pos > width:
            raise ValueError("CCITT 1-D run overruns row")
        curt.append(pos)
        color ^= 1
    # curt holds every run boundary incl. the terminal ``width`` entry
    # — the same shape the 2-D decoder produces (its final vertical
    # lands at width): entries at ``width`` are interchangeable with
    # the reference-line sentinels in every b1/b2 lookup, so no
    # normalization is needed between 1-D and 2-D lines
    return curt


def _render_rows(trans_rows: list[list[int]], width: int) -> bytearray:
    """Transition lists → packed 1-bit rows (MSB-first, byte-padded;
    bit 1 = black sample)."""
    rowbytes = (width + 7) // 8
    out = bytearray(rowbytes * len(trans_rows))
    for y, curt in enumerate(trans_rows):
        t = list(curt)
        if len(t) & 1:
            t.append(width)
        row = np.zeros(width, np.uint8)
        for k in range(0, len(t), 2):
            row[t[k]: t[k + 1]] = 1
        out[y * rowbytes: (y + 1) * rowbytes] = np.packbits(row).tobytes()
    return out


def _ccitt_g4_decode(data: bytes, width: int, nrows: int) -> bytearray:
    """T.6 MMR bytes → packed 1-bit rows (MSB-first, rows padded to
    bytes; bit 0 = white sample).  Decodes exactly ``nrows`` rows and
    ignores trailing padding/EOFB."""
    bits = _Bits(data)
    ref = [width, width]  # reference-line transitions (line 0: all white)
    rows = []
    for _ in range(nrows):
        curt = _ccitt_2d_line_decode(bits, ref, width)
        rows.append(curt)
        ref = curt + [width, width]
    return _render_rows(rows, width)


def _ccitt_mh_decode(data: bytes, width: int, nrows: int) -> bytearray:
    """TIFF compression 2 (CCITT RLE / modified Huffman): every line
    1-D coded independently, each line starting on a BYTE boundary
    (TIFF 6.0 §10), no EOL codes."""
    bits = _Bits(data)
    rows = []
    for _ in range(nrows):
        if bits.pos & 7:
            bits.pos += 8 - (bits.pos & 7)  # byte-align per line
        rows.append(_ccitt_1d_line_decode(bits, width))
    return _render_rows(rows, width)


def _ccitt_t4_eol(bits: _Bits) -> int:
    """Consume one T.4 EOL (≥ 11 zeros then 1 — extra zeros are legal
    FILL bits, T4Options bit 2 or plain T.4 fill).  Returns the number
    of zeros seen (callers may sanity-check ≥ 11)."""
    zeros = 0
    while not bits.take():
        zeros += 1
        if zeros > 64 + 11:
            raise ValueError("CCITT T.4 runaway fill/EOL")
    if zeros < 11:
        raise ValueError(f"CCITT T.4 expected EOL, got {zeros} zeros")
    return zeros


def _ccitt_t4_decode(
    data: bytes, width: int, nrows: int, two_d: bool
) -> bytearray:
    """TIFF compression 3 (CCITT T.4 / Group 3): an EOL precedes every
    line (fill bits tolerated); in 2-D mode (T4Options bit 0) each EOL
    carries a tag bit — 1 = the next line is 1-D, 0 = 2-D against the
    previous line.  RTC/EOFB after the last row is ignored (the row
    count drives termination)."""
    bits = _Bits(data)
    ref = [width, width]
    rows = []
    for _ in range(nrows):
        _ccitt_t4_eol(bits)
        if two_d and bits.take() == 0:
            curt = _ccitt_2d_line_decode(bits, ref, width)
        else:
            curt = _ccitt_1d_line_decode(bits, width)
        rows.append(curt)
        ref = curt + [width, width]
    return _render_rows(rows, width)


class _CcittWriter:
    """MSB-first bit emitter with the shared T.4 run-length coder."""

    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def emit(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nacc += 1
            if self.nacc == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nacc = 0

    def emit_run(self, n: int, color: int) -> None:
        term = _T4_BLACK_TERM if color else _T4_WHITE_TERM
        mk = _T4_BLACK_MAKEUP if color else _T4_WHITE_MAKEUP
        while n >= 64:
            if n >= 1792:
                v = min(2560, (n // 64) * 64)
                self.emit(_T4_EXT_MAKEUP[v])
            else:
                v = (n // 64) * 64
                self.emit(mk[v])
            n -= v
        self.emit(term[n])

    def byte_align(self) -> None:
        if self.nacc:
            self.buf.append(self.acc << (8 - self.nacc))
            self.acc = 0
            self.nacc = 0

    def done(self) -> bytes:
        self.byte_align()
        return bytes(self.buf)


def _row_transitions(r: np.ndarray) -> list[int]:
    ch = (np.flatnonzero(r[1:] != r[:-1]) + 1).tolist()
    return [0] + ch if r[0] else ch


def _ccitt_2d_line_encode(
    wtr: _CcittWriter, curt: list[int], ref: list[int], w: int
) -> None:
    """Encode ONE line 2-D against ``ref`` (both transition lists; ref
    padded with sentinels).  Mode choice per the spec: pass when
    b2 < a1, vertical when |a1 − b1| ≤ 3, else horizontal."""
    import bisect

    trans = curt + [w, w]
    a0 = -1
    color = 0
    ti = 0  # next coding-line transition index > a0
    while a0 < w:
        while ti < len(trans) and trans[ti] <= a0:
            ti += 1
        a1 = trans[ti] if ti < len(trans) else w
        i = bisect.bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else w
        b2 = ref[i + 1] if i + 1 < len(ref) else w
        if b2 < a1:
            wtr.emit("0001")  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            wtr.emit({0: "1", 1: "011", -1: "010", 2: "000011",
                      -2: "000010", 3: "0000011", -3: "0000010"}[a1 - b1])
            a0 = a1
            color ^= 1
        else:
            a2 = trans[ti + 1] if ti + 1 < len(trans) else w
            wtr.emit("001")
            base = a0 if a0 > 0 else 0
            wtr.emit_run(a1 - base, color)
            wtr.emit_run(a2 - a1, 1 - color)
            a0 = a2


def _ccitt_1d_line_encode(wtr: _CcittWriter, curt: list[int], w: int) -> None:
    """Encode ONE line as alternating T.4 runs starting white."""
    pos = 0
    color = 0
    for t in curt + [w]:
        if t > w:
            raise ValueError("transition past row end")
        wtr.emit_run(t - pos, color)
        pos = t
        color ^= 1
        if pos == w:
            break


def _ccitt_g4_encode(rows: np.ndarray) -> bytes:
    """(H, W) 0/1 (1 = black sample) → T.6 MMR bytes + EOFB."""
    h, w = rows.shape
    wtr = _CcittWriter()
    ref = [w, w]
    for y in range(h):
        curt = _row_transitions(rows[y])
        _ccitt_2d_line_encode(wtr, curt, ref, w)
        ref = curt + [w, w]
    wtr.emit("000000000001" * 2)  # EOFB
    return wtr.done()


def _ccitt_mh_encode(rows: np.ndarray) -> bytes:
    """(H, W) 0/1 → TIFF compression-2 bytes: 1-D per line, each line
    byte-aligned, no EOLs."""
    h, w = rows.shape
    wtr = _CcittWriter()
    for y in range(h):
        _ccitt_1d_line_encode(wtr, _row_transitions(rows[y]), w)
        wtr.byte_align()
    return wtr.done()


def _ccitt_t4_encode(rows: np.ndarray, two_d: bool) -> bytes:
    """(H, W) 0/1 → TIFF compression-3 bytes: EOL (+tag bit in 2-D
    mode) before every line; in 2-D mode the first line is 1-D and the
    rest code against their predecessor (K = ∞ is legal for TIFF —
    K only bounds error propagation on real fax links)."""
    h, w = rows.shape
    wtr = _CcittWriter()
    ref = [w, w]
    for y in range(h):
        curt = _row_transitions(rows[y])
        wtr.emit("000000000001")  # EOL
        if two_d:
            one_d = y == 0
            wtr.emit("1" if one_d else "0")  # tag bit
            if one_d:
                _ccitt_1d_line_encode(wtr, curt, w)
            else:
                _ccitt_2d_line_encode(wtr, curt, ref, w)
        else:
            _ccitt_1d_line_encode(wtr, curt, w)
        ref = curt + [w, w]
    return wtr.done()


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF bytes → (H, W, 3) uint8 RGB (grayscale
    replicated; WhiteIsZero inverted).  First IFD only (the multimodal
    contract is one image per asset); see the section comment for the
    supported/gated feature matrix."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload (missing byte-order mark)")
    bo = "<" if payload[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise ValueError(f"TIFF magic {magic} != 42")
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF truncated before first IFD")
    (n_ent,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for k in range(n_ent):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(payload):
            raise ValueError("TIFF IFD truncated")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, off)
        if typ not in _TIFF_TYPE_SIZE:
            continue  # unknown types: skip per spec
        size = _TIFF_TYPE_SIZE[typ] * cnt
        voff = off + 8 if size <= 4 else struct.unpack_from(
            bo + "I", payload, off + 8
        )[0]
        if voff + size > len(payload):
            raise ValueError(f"TIFF tag {tag} value out of bounds")
        if typ == 3:
            vals = list(
                struct.unpack_from(bo + f"{cnt}H", payload, voff)
            )
        elif typ == 4:
            vals = list(
                struct.unpack_from(bo + f"{cnt}I", payload, voff)
            )
        elif typ in (1, 2, 7):  # BYTE / ASCII / UNDEFINED (JPEGTables)
            vals = list(payload[voff : voff + cnt])
        else:  # RATIONAL — unused by this decoder
            vals = []
        tags[tag] = vals

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    tiled = 322 in tags or 323 in tags or 324 in tags or 325 in tags
    w = one(256)
    h = one(257)
    spp = one(277, 1)
    bits = tags.get(258, [1])
    comp = one(259, 1)
    photo = one(262, 1 if spp == 1 else 2)
    planar = one(284, 1)
    pred = one(317, 1)
    if planar not in (1, 2):
        raise ValueError(f"TIFF planar configuration {planar}")
    if any(b != bits[0] for b in bits):
        raise NotImplementedError(f"TIFF mixed bits-per-sample {bits}")
    b0 = bits[0]
    if b0 not in (1, 4, 8, 16):
        raise NotImplementedError(
            f"TIFF bits-per-sample {bits} (1/4/8/16 supported)"
        )
    if b0 in (1, 4) and spp != 1:
        raise NotImplementedError(
            f"TIFF {b0}-bit with {spp} samples per pixel"
        )
    if photo not in (0, 1, 2, 3, 6):
        raise NotImplementedError(
            f"TIFF photometric interpretation {photo}"
        )
    if photo == 6 and comp != 7:
        # raw YCbCr sample layout (subsampling tags, positioning) is
        # only handled through the JPEG codec's own color machinery
        raise NotImplementedError(
            "TIFF photometric 6 (YCbCr) without JPEG compression"
        )
    if spp not in (1, 3):
        raise NotImplementedError(
            f"TIFF with {spp} samples per pixel"
        )
    if comp not in (1, 2, 3, 4, 5, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp} (none/CCITT-MH/G3/G4/LZW/"
            "Deflate/PackBits/JPEG-7 only)"
        )
    if comp == 7:
        # TIFF-EP / Technical Note 2 new-style JPEG (round-15): each
        # strip/tile is a complete abbreviated JPEG stream; shared
        # tables ride the JPEGTables tag 347 and are spliced in after
        # each segment's SOI.  The JPEG codec owns color: photometric
        # 6 means the usual YCbCr-coded stream (decode_jpeg outputs
        # RGB), 1/0 a single-component stream.  RGB-kept-as-RGB
        # (photometric 2) and per-plane JPEG (planar 2) stay under
        # the tiff-compression gate; palette JPEG is invalid.
        if photo == 2 or planar == 2:
            raise NotImplementedError(
                "TIFF JPEG (compression 7) with RGB photometric 2 or "
                "PlanarConfiguration 2"
            )
        if photo == 3:
            raise ValueError("TIFF palette with JPEG compression is invalid")
        if b0 != 8 or pred != 1:
            raise ValueError(
                f"TIFF JPEG with bits={b0}, predictor={pred} is invalid "
                "(8-bit, no predictor)"
            )
        if photo == 6 and spp != 3:
            raise ValueError(f"TIFF YCbCr with spp={spp} is invalid")
    fill = one(266, 1)
    if fill not in (1, 2):
        raise ValueError(f"TIFF FillOrder {fill} is invalid")
    if fill == 2 and not (comp in (1, 2, 3, 4) and b0 == 1):
        # round-15: LSB-first closed for the shapes it occurs in (fax
        # CCITT + uncompressed bilevel — reversing each byte restores
        # MSB-first for both the CCITT bitstream and packed pixels);
        # byte-oriented codecs stay gated
        raise NotImplementedError(
            "TIFF FillOrder 2 (LSB-first) outside the CCITT/"
            "uncompressed bilevel family"
        )
    if comp in (2, 3, 4) and (b0 != 1 or spp != 1 or pred != 1):
        # CCITT coding is DEFINED over bilevel data only — not a
        # gate, invalid
        raise ValueError(
            f"TIFF CCITT compression {comp} with bits={b0}, spp={spp},"
            f" predictor={pred} is invalid (bilevel only)"
        )
    t4_2d = bool(one(292, 0) & 1) if comp == 3 else False
    if comp == 3 and one(292, 0) & 2:
        # round-15 ADVICE: T4Options bit 1 = uncompressed mode ALLOWED.
        # A 1-D coded line's uncompressed-mode entry code would
        # otherwise die in the MH run decoder as ValueError('bad run
        # code') instead of the registered named gate (the 2-D path
        # already gates extension codes) — gate at parse time so
        # compression-3 files declaring the mode raise honestly even
        # before a line uses it.
        raise NotImplementedError(
            "CCITT 2-D extension code (uncompressed mode): T4Options "
            "bit 1 set on compression-3"
        )
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred}")
    if pred == 2 and b0 not in (8, 16):
        raise NotImplementedError(
            f"TIFF predictor 2 with {b0}-bit samples"
        )
    if planar == 2 and spp == 1:
        planar = 1  # single-channel planes ARE chunky
    cmap = None
    if photo == 3:  # palette color (round-13): ColorMap tag 320,
        # 3·2^bits SHORTs plane-major (R.. G.. B..), 16-bit entries
        # whose high byte is the 8-bit channel value
        if spp != 1 or b0 not in (4, 8):
            raise ValueError(
                f"TIFF palette with spp={spp}, bits={b0} is invalid"
            )
        cm = tags.get(320)
        if not cm or len(cm) != 3 * (1 << b0):
            raise ValueError("TIFF palette ColorMap missing or mis-sized")
        cmap = (
            np.array(cm, np.uint16).reshape(3, 1 << b0).T >> 8
        ).astype(np.uint8)

    def seg(
        so: int, sc: int, expect: int, what: str,
        dims: tuple[int, int] | None = None,
    ) -> bytearray:
        """Decompress one strip/tile segment to exactly ``expect``
        bytes (shared by both organizations — compression applies per
        segment identically, TIFF 6.0 §15.1).  ``dims`` = (nrows,
        width) of the segment, needed only by CCITT G4 (2-D coding
        restarts with an all-white reference line per segment)."""
        if so + sc > len(payload):
            raise ValueError(f"TIFF {what} out of bounds")
        chunk = payload[so : so + sc]
        if fill == 2:
            chunk = bytes(_BITREV[np.frombuffer(chunk, np.uint8)])
        if comp in (2, 3, 4):
            assert dims is not None
            nr, wd = dims
            if comp == 4:
                return _ccitt_g4_decode(bytes(chunk), wd, nr)
            if comp == 3:
                return _ccitt_t4_decode(bytes(chunk), wd, nr, t4_2d)
            return _ccitt_mh_decode(bytes(chunk), wd, nr)
        if comp == 1:
            if len(chunk) < expect:
                raise ValueError(f"TIFF uncompressed {what} short")
            return bytearray(chunk[:expect])
        if comp == 5:
            return _tiff_lzw_decode(chunk, expect)
        if comp in (8, 32946):  # Adobe / legacy Deflate: zlib streams
            import zlib

            try:
                out = bytearray(zlib.decompress(bytes(chunk)))
            except zlib.error as e:
                raise ValueError(f"TIFF deflate {what} corrupt: {e}")
            if len(out) < expect:
                raise ValueError(f"TIFF deflate {what} short")
            del out[expect:]
            return out
        return _packbits_decode(chunk, expect)

    jpeg_tables_body = None
    if comp == 7 and 347 in tags:
        jt = bytes(tags[347])
        if (
            len(jt) < 4
            or jt[:2] != b"\xff\xd8"
            or jt[-2:] != b"\xff\xd9"
        ):
            raise ValueError("TIFF JPEGTables not an SOI..EOI stream")
        jpeg_tables_body = jt[2:-2]

    def jseg(
        so: int, sc: int, nrows: int, width: int, what: str
    ) -> np.ndarray:
        """One compression-7 segment → (nrows, width, spp) int64: the
        segment's abbreviated JPEG stream with the shared JPEGTables
        body spliced after its SOI (tables may also arrive in-stream;
        later DQT/DHT simply override, T.81 semantics), decoded by the
        in-house JPEG codec and cropped to the segment geometry
        (tiles are padded to full size; edge strips may be too)."""
        if so + sc > len(payload):
            raise ValueError(f"TIFF {what} out of bounds")
        chunk = bytes(payload[so : so + sc])
        if chunk[:2] != b"\xff\xd8":
            raise ValueError(f"TIFF JPEG {what} missing SOI")
        if jpeg_tables_body is not None:
            chunk = chunk[:2] + jpeg_tables_body + chunk[2:]
        arr = decode_jpeg(chunk)  # (sh, sw, 3), grayscale replicated
        if arr.shape[0] < nrows or arr.shape[1] < width:
            raise ValueError(
                f"TIFF JPEG {what} decodes {arr.shape[:2]}, needs "
                f"{nrows}x{width}"
            )
        a = arr[:nrows, :width].astype(np.int64)
        return a[:, :, :1] if spp == 1 else a

    def rb(width: int, nch: int) -> int:
        """Bytes per scanline of ``width`` px × ``nch`` channels at b0
        bits (TIFF rows pad to the byte boundary)."""
        return (width * nch * b0 + 7) // 8

    def samples(sb: bytes, nrows: int, width: int, nch: int) -> np.ndarray:
        """Decompressed segment bytes → (nrows, width, nch) int
        samples at NATIVE depth (predictor undone here — it operates
        on raw samples, per segment row, BEFORE any depth scaling;
        16-bit samples follow the file byte order)."""
        if b0 == 8:
            a = np.frombuffer(sb, np.uint8).reshape(nrows, width, nch)
        elif b0 == 16:
            a = np.frombuffer(sb, dtype=bo + "u2").reshape(
                nrows, width, nch
            )
        else:  # 1/4-bit gray or palette indices, MSB-first packed
            packed = np.frombuffer(sb, np.uint8).reshape(nrows, rb(width, 1))
            bits_arr = np.unpackbits(packed, axis=1)[:, : width * b0]
            a = (
                bits_arr.reshape(nrows, width, b0)
                * (1 << np.arange(b0 - 1, -1, -1, dtype=np.uint8))
            ).sum(axis=2, dtype=np.int64)[..., None]
        if pred == 2:
            a = np.cumsum(a.astype(np.uint64), axis=1) & ((1 << b0) - 1)
        return a.astype(np.int64)

    if tiled:
        # Tile organization (TIFF 6.0 §15, round-13 — the gate the
        # verdict ranked likeliest to be hit by real corpora): tiles
        # are ALWAYS full tw×tl (edge tiles padded by the encoder,
        # cropped here), ordered left-to-right, top-to-bottom; the
        # predictor restarts per tile row, so it is undone PER TILE
        # before placement (the strip path can cumsum whole image
        # rows; a tile row is not an image row).
        tw = one(322)
        tl = one(323)
        toffs = tags.get(324)
        tcnts = tags.get(325)
        if tw <= 0 or tl <= 0:
            raise ValueError(f"TIFF tile size {tw}x{tl} invalid")
        if not toffs or not tcnts or len(toffs) != len(tcnts):
            raise ValueError("TIFF tile offsets/byte-counts inconsistent")
        ntx = (w + tw - 1) // tw
        nty = (h + tl - 1) // tl
        # planar 2 (round-13): the tile sequence repeats PER PLANE
        # (§15: "tiles are stored in planar order"), each tile a
        # single-channel block
        nplanes = spp if planar == 2 else 1
        nch = 1 if planar == 2 else spp
        if len(toffs) != ntx * nty * nplanes:
            raise ValueError(
                f"TIFF tile count {len(toffs)} != grid "
                f"{ntx}x{nty}x{nplanes}"
            )
        a = np.empty((h, w, spp), np.int64)
        expect = tl * rb(tw, nch)
        for ti, (so, sc) in enumerate(zip(toffs, tcnts)):
            pi, cell = divmod(ti, ntx * nty)
            ty, tx = divmod(cell, ntx)
            if comp == 7:
                t = jseg(so, sc, tl, tw, f"tile {ti}")
            else:
                t = samples(
                    bytes(seg(so, sc, expect, f"tile {ti}",
                              dims=(tl, tw))),
                    tl, tw, nch,
                )
            y0, x0 = ty * tl, tx * tw
            tgt = a[y0 : y0 + tl, x0 : x0 + tw]
            crop = t[: min(tl, h - y0), : min(tw, w - x0)]
            if planar == 2:
                tgt[:, :, pi] = crop[:, :, 0]
            else:
                tgt[:] = crop
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF strip offsets/byte-counts inconsistent")
        rps = one(278, h)
        spw = (h + rps - 1) // rps  # strips per plane
        if planar == 2:
            # separate planes (§ PlanarConfiguration 2): all of plane
            # 0's strips, then plane 1's, then plane 2's — each strip
            # a single-channel scanline block (round-13)
            if len(offsets) != spp * spw:
                raise ValueError(
                    f"TIFF planar-2 strip count {len(offsets)} != "
                    f"{spp}x{spw}"
                )
            planes = []
            for p in range(spp):
                rows = []
                for si in range(spw):
                    nrows = min(rps, h - si * rps)
                    if nrows <= 0:
                        raise ValueError("TIFF more strips than rows")
                    so, sc = offsets[p * spw + si], counts[p * spw + si]
                    rows.append(
                        samples(
                            bytes(seg(so, sc, nrows * rb(w, 1),
                                      f"strip {p}/{si}",
                                      dims=(nrows, w))),
                            nrows, w, 1,
                        )
                    )
                planes.append(np.vstack(rows)[..., 0])
            a = np.stack(planes, axis=2)
        else:
            blocks = []
            for si, (so, sc) in enumerate(zip(offsets, counts)):
                nrows = min(rps, h - si * rps)
                if nrows <= 0:
                    raise ValueError("TIFF more strips than rows")
                if comp == 7:
                    blocks.append(jseg(so, sc, nrows, w, f"strip {si}"))
                else:
                    blocks.append(
                        samples(
                            bytes(seg(so, sc, nrows * rb(w, spp),
                                      f"strip {si}", dims=(nrows, w))),
                            nrows, w, spp,
                        )
                    )
            a = np.vstack(blocks)
    if cmap is not None:
        return cmap[a[..., 0]]
    # depth-normalize to 8-bit output (16-bit keeps the high byte —
    # the PNG-decoder convention; sub-byte scales to full range)
    if b0 == 16:
        a = a >> 8
    elif b0 == 4:
        a = a * 17
    elif b0 == 1:
        a = a * 255
    a = a.astype(np.uint8)
    if photo == 0:  # WhiteIsZero
        a = 255 - a
    if spp == 1:
        a = np.repeat(a, 3, axis=2)
    return a


def _jpeg_split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a complete JPEG stream into (table segments, abbreviated
    stream): every DQT/DHT segment is extracted for the TIFF-EP
    JPEGTables tag, the rest (SOI, SOF, SOS + entropy data, EOI) is
    returned verbatim — T.81 B.2.4 abbreviated-format surgery."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray()
    kept = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 2 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = stream[pos + 1]
        if marker == 0xD9:
            kept += stream[pos:]
            break
        (ln,) = struct.unpack_from(">H", stream, pos + 2)
        segment = stream[pos : pos + 2 + ln]
        if marker == 0xDA:
            # SOS: entropy data follows until EOI — keep verbatim
            kept += stream[pos:]
            break
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += segment
        else:
            kept += segment
        pos += 2 + ln
    return bytes(tables), bytes(kept)


def encode_tiff(
    pixels: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    tile_size: tuple[int, int] | None = None,
    bits: int = 8,
    palette: np.ndarray | None = None,
    planar: bool = False,
    jpeg_tables: bool = True,
    fill_order: int = 1,
) -> bytes:
    """(H, W, 3) RGB — or (H, W) grayscale/index — → baseline TIFF
    bytes.  ``compression``: "none" / "lzw" / "packbits" / "deflate" /
    the CCITT modes / "jpeg" (compression 7: one complete JPEG per
    strip/tile at 4:4:4, photometric 6 for RGB; ``jpeg_tables=True``
    hoists the shared DQT/DHT into tag 347 and abbreviates the
    segments — the TIFF-EP layout; multi-strip needs rows_per_strip a
    multiple of 8, the MCU row);
    ``predictor`` applies horizontal differencing (predictor 2, the
    LZW companion; bits 8/16 only); ``rows_per_strip`` defaults to
    whole-image; ``big_endian`` writes MM byte order.
    ``tile_size=(tw, tl)`` switches to TILE organization (TIFF 6.0
    §15: multiples of 16 per spec, tags 322–325, edge tiles
    zero-padded to full size; predictor restarts per tile row).
    Round-13 depth/layout axes: ``bits`` ∈ {1, 4, 8, 16} (sub-byte =
    grayscale/palette only, MSB-first row packing; 16 = uint16 input
    in the file byte order); ``palette`` = (2^bits, 3) uint8 colormap
    → photometric 3 with tag 320 (entries ·257, the spec's 16-bit
    ramp); ``planar=True`` writes PlanarConfiguration 2 (per-plane
    strip sequences, or per-plane tile sequences with
    ``tile_size``; RGB only)."""
    if compression not in ("none", "lzw", "packbits", "deflate",
                           "g4", "mh", "t4", "t4-2d", "jpeg"):
        raise ValueError(f"compression {compression!r}")
    if fill_order not in (1, 2):
        raise ValueError(f"fill_order {fill_order}")
    if fill_order == 2 and not (
        compression in ("g4", "mh", "t4", "t4-2d")
        or (compression == "none" and bits == 1)
    ):
        raise ValueError(
            "fill_order 2 is written only for CCITT / uncompressed "
            "bilevel (the shapes real fax files carry)"
        )
    _jpeg = compression == "jpeg"
    if _jpeg and (
        bits != 8 or predictor or palette is not None or planar
    ):
        raise ValueError(
            "jpeg compression: 8-bit chunky, no predictor, no palette"
        )
    if bits not in (1, 4, 8, 16):
        raise ValueError(f"bits {bits}")
    dt = np.uint16 if bits == 16 else np.uint8
    arr = np.asarray(pixels, dtype=dt)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(f"expected (H, W[, 1|3]), got {arr.shape}")
    h, w, spp = arr.shape
    _ccitt = compression in ("g4", "mh", "t4", "t4-2d")
    if _ccitt and (bits != 1 or predictor):
        raise ValueError(
            f"{compression} is bilevel (bits=1) and predictor-free"
        )
    if bits in (1, 4):
        if spp != 1:
            raise ValueError(f"{bits}-bit is single-channel only")
        if predictor:
            raise ValueError(f"predictor 2 undefined for {bits}-bit")
        if arr.max(initial=0) >= (1 << bits):
            raise ValueError(f"{bits}-bit sample out of range")
    if palette is not None and (spp != 1 or bits not in (4, 8)):
        raise ValueError("palette needs (H, W) indices at 4/8 bits")
    if planar and (spp != 3 or bits not in (8, 16)):
        raise ValueError("planar=True: RGB at 8/16 bits only")
    bo = ">" if big_endian else "<"
    rps = h if rows_per_strip is None else max(1, rows_per_strip)
    if _jpeg and tile_size is None and rps < h and rps % 8:
        # spec: strip height must be an MCU-row multiple (8 at 4:4:4)
        # so every strip is an independent full-MCU JPEG
        raise ValueError(
            f"jpeg strips need rows_per_strip % 8 == 0 (got {rps})"
        )

    def _diff(block: np.ndarray) -> np.ndarray:
        wide = np.int32 if bits == 16 else np.int16
        return np.concatenate(
            [block[:, :1], np.diff(block.astype(wide), axis=1).astype(dt)],
            axis=1,
        ).astype(dt)

    def _ser(block: np.ndarray) -> bytes:
        """(rows, width, nch) → file bytes at the target depth."""
        if bits == 16:
            return block.astype(bo + "u2").tobytes()
        if bits == 8:
            return block.astype(np.uint8).tobytes()
        rows, width, _ = block.shape
        expanded = (
            (block[:, :, 0, None] >> np.arange(bits - 1, -1, -1)) & 1
        ).astype(np.uint8)
        return np.packbits(
            expanded.reshape(rows, width * bits), axis=1
        ).tobytes()

    def _block(block: np.ndarray) -> bytes:
        """Serialize + compress one strip/tile block.  G4 codes the 2-D
        0/1 sample block directly (1 = black under the photometric-0
        header this encoder writes for it); JPEG encodes the block as
        one complete stream (abbreviated later if tables ride tag
        347); everything else serializes to row bytes first."""
        if _jpeg:
            img = block[:, :, 0] if spp == 1 else block
            return encode_jpeg(np.ascontiguousarray(img, np.uint8))
        if _ccitt:
            bl = block[:, :, 0].astype(np.uint8)
            if compression == "g4":
                return _ccitt_g4_encode(bl)
            if compression == "mh":
                return _ccitt_mh_encode(bl)
            return _ccitt_t4_encode(bl, compression == "t4-2d")
        return _compress(_ser(block))

    def _compress(chunk: bytes) -> bytes:
        if compression == "lzw":
            return _tiff_lzw_encode(chunk)
        if compression == "packbits":
            return _packbits_encode(chunk)
        if compression == "deflate":
            import zlib

            return zlib.compress(chunk, 6)
        return chunk

    strips: list[bytes] = []
    if tile_size is not None:
        tw, tl = tile_size
        if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
            raise ValueError(
                f"tile size {tw}x{tl} (spec: positive multiples of 16)"
            )
        ph = ((h + tl - 1) // tl) * tl
        pw = ((w + tw - 1) // tw) * tw
        padded = np.zeros((ph, pw, spp), dt)
        padded[:h, :w] = arr
        plane_slices = (
            [padded[:, :, p : p + 1] for p in range(spp)]
            if planar
            else [padded]
        )
        for pl in plane_slices:
            for y0 in range(0, ph, tl):
                for x0 in range(0, pw, tw):
                    t = pl[y0 : y0 + tl, x0 : x0 + tw]
                    if predictor:
                        t = _diff(t)
                    strips.append(_block(t))
    elif planar:
        for p in range(spp):
            plane = arr[:, :, p : p + 1]
            data = _diff(plane) if predictor else plane
            for r0 in range(0, h, rps):
                strips.append(_block(data[r0 : r0 + rps]))
    else:
        data = _diff(arr) if predictor else arr
        for r0 in range(0, h, rps):
            strips.append(_block(data[r0 : r0 + rps]))
    comp_code = {
        "none": 1, "lzw": 5, "packbits": 32773, "deflate": 8,
        "g4": 4, "mh": 2, "t4": 3, "t4-2d": 3, "jpeg": 7,
    }[compression]
    if fill_order == 2:
        strips = [
            bytes(_BITREV[np.frombuffer(st, np.uint8)]) for st in strips
        ]

    jpeg_tables_blob = None
    if _jpeg and jpeg_tables and strips:
        # TIFF-EP shape: DQT/DHT hoisted ONCE into tag 347 (identical
        # Annex-K tables in every segment by construction), segments
        # abbreviated — the layout real camera/scanner files carry
        abbr = []
        tbl = b""
        for s in strips:
            t, a = _jpeg_split_tables(s)
            tbl = tbl or t
            abbr.append(a)
        strips = abbr
        jpeg_tables_blob = b"\xff\xd8" + tbl + b"\xff\xd9"

    out = bytearray()
    out += (b"MM" if big_endian else b"II")
    out += struct.pack(bo + "HI", 42, 0)  # IFD offset patched below
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
    if len(out) % 2:
        out += b"\x00"  # IFDs are word-aligned

    entries: list[tuple[int, int, int, bytes | int]] = []

    def ent(tag: int, typ: int, vals: list[int]) -> None:
        cnt = len(vals)
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack(bo + f"{cnt}{fmt}", *vals)
        entries.append((tag, typ, cnt, packed))

    ent(256, 4, [w])
    ent(257, 4, [h])
    ent(258, 3, [bits] * spp)
    ent(259, 3, [comp_code])
    if palette is not None:
        ent(262, 3, [3])
        pal = np.asarray(palette, np.uint16)
        if pal.shape != (1 << bits, 3):
            raise ValueError(f"palette shape {pal.shape}")
        # plane-major R..G..B.., 16-bit ramp (v*257: high byte = v)
        ent(320, 3, list((pal.T.reshape(-1) * 257).astype(int)))
    elif _ccitt:
        ent(262, 3, [0])  # fax convention: 0 = white (WhiteIsZero)
    elif _jpeg:
        ent(262, 3, [1 if spp == 1 else 6])  # 6 = YCbCr-coded JPEG
    else:
        ent(262, 3, [1 if spp == 1 else 2])
    ent(277, 3, [spp])
    if planar:
        ent(284, 3, [2])
    if tile_size is not None:
        ent(322, 4, [tile_size[0]])
        ent(323, 4, [tile_size[1]])
        ent(324, 4, strip_offsets)
        ent(325, 4, [len(s) for s in strips])
    else:
        ent(273, 4, strip_offsets)
        ent(278, 4, [rps])
        ent(279, 4, [len(s) for s in strips])
    if fill_order == 2:
        ent(266, 3, [2])
    if compression == "t4-2d":
        ent(292, 4, [1])  # T4Options: bit 0 = 2-D coding
    if predictor:
        ent(317, 3, [2])
    if jpeg_tables_blob is not None:
        # type 7 = UNDEFINED, raw bytes (goes through the same
        # inline-or-overflow layout as every packed entry)
        entries.append(
            (347, 7, len(jpeg_tables_blob), jpeg_tables_blob)
        )
    entries.sort(key=lambda e: e[0])  # spec: ascending tag order

    # lay out: IFD, then overflow value area
    ifd_off = len(out)
    ifd = bytearray(struct.pack(bo + "H", len(entries)))
    overflow = bytearray()
    ov_base = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, cnt, packed in entries:
        if len(packed) <= 4:
            val = packed + b"\x00" * (4 - len(packed))
        else:
            val = struct.pack(bo + "I", ov_base + len(overflow))
            overflow += packed
            if len(overflow) % 2:
                overflow += b"\x00"
        ifd += struct.pack(bo + "HHI", tag, typ, cnt) + val
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    out += ifd + overflow
    struct.pack_into(bo + "I", out, 4, ifd_off)
    return bytes(out)


# ------------------------------------------------------ G.711 companding
# ITU-T G.711 A-law / µ-law (round-14): the classic public companding
# algorithms (the segment/bias arithmetic documented in the spec and
# the well-known public-domain g711 reference code), vectorized in
# numpy.  Both are BIJECTIONS between the 256 code bytes and their
# linear values, so the all-256-codes encode(decode(byte)) == byte
# round-trip in tests pins every code path exactly.

_G711_BIAS = 0x84
_MULAW_CLIP = 32635


def _mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """(n,) uint8 µ-law codes → int16-range linear values."""
    c = (~codes.astype(np.int64)) & 0xFF
    t = (((c & 0x0F) << 3) + _G711_BIAS) << ((c & 0x70) >> 4)
    return np.where(c & 0x80, _G711_BIAS - t, t - _G711_BIAS).astype(
        np.int64
    )


def _mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """(n,) int16-range linear values → uint8 µ-law codes."""
    x = pcm.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(np.where(x < 0, -x, x)), _MULAW_CLIP)
    mag = mag + _G711_BIAS
    # segment = position of the highest set bit above bit 7 (0..7)
    seg = np.maximum(
        np.int64(np.ceil(0)),
        (np.floor(np.log2(mag)) - 7).astype(np.int64),
    )
    seg = np.clip(seg, 0, 7)
    uval = sign | (seg << 4) | ((mag >> (seg + 3)) & 0x0F)
    return ((~uval) & 0xFF).astype(np.uint8)


def _alaw_decode(codes: np.ndarray) -> np.ndarray:
    """(n,) uint8 A-law codes → int16-range linear values."""
    a = codes.astype(np.int64) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int64)


def _alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """(n,) int16-range linear values → uint8 A-law codes."""
    x = pcm.astype(np.int64)
    mask = np.where(x >= 0, 0xD5, 0x55)
    pval = np.where(x >= 0, x, -x - 1) >> 3  # 13-bit magnitude
    pv = np.maximum(pval, 1)
    seg = np.clip((np.floor(np.log2(pv)) - 4).astype(np.int64), 0, 8)
    seg = np.where(pval <= 0x1F, 0, seg)
    aval = seg << 4
    low = np.where(seg < 2, (pval >> 1) & 0x0F, pval >> seg & 0x0F)
    aval = np.where(seg >= 8, 0x7F, aval | low)
    return (aval ^ mask).astype(np.uint8)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000, fmt: str = "pcm16"
) -> bytes:
    """(n,) or (n, channels) float in [-1, 1] → RIFF/WAVE bytes (the
    canonical fmt-chunk layout from the public RIFF spec).  ``fmt``:
    "pcm16" (integer PCM, tag 1), "float32" (IEEE float, tag 3),
    "alaw"/"mulaw" (G.711 companded 8-bit, tags 6/7 — quantized to
    int16 first, then companded; round-14); an "ext-" prefix (e.g.
    "ext-pcm16") wraps the same data in WAVE_FORMAT_EXTENSIBLE
    (tag 0xFFFE + SubFormat GUID — round-15).  The encode side exists so
    tests can synthesize REAL audio bytes to push through the Spark
    plumbing, mirroring encode_bmp/encode_ppm."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch), got {arr.shape}")
    ch = arr.shape[1]
    extensible = fmt.startswith("ext-")
    if extensible:
        fmt = fmt[4:]
    if fmt == "pcm16":
        tag, bits = 1, 16
        data = np.clip(
            np.round(arr * 32767.0), -32768, 32767
        ).astype("<i2").tobytes()
    elif fmt == "float32":
        tag, bits = 3, 32
        data = arr.astype("<f4").tobytes()
    elif fmt in ("alaw", "mulaw"):
        tag, bits = (6, 8) if fmt == "alaw" else (7, 8)
        pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype(
            np.int64
        )
        enc = _alaw_encode if fmt == "alaw" else _mulaw_encode
        data = enc(pcm.reshape(-1)).tobytes()
    else:
        raise ValueError(
            f"fmt {fmt!r}: pcm16|float32|alaw|mulaw (ext- prefix wraps "
            "in WAVE_FORMAT_EXTENSIBLE)"
        )
    block = ch * (bits // 8)
    if extensible:
        # WAVE_FORMAT_EXTENSIBLE wrapper: cbSize 22, valid bits =
        # container depth, channel mask 0 (unpositioned), SubFormat =
        # classic tag over the standard media-subtype GUID suffix
        fmt = struct.pack(
            "<HHIIHH", 0xFFFE, ch, sample_rate, sample_rate * block,
            block, bits,
        ) + struct.pack("<HHI", 22, bits, 0) + struct.pack(
            "<H", tag
        ) + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    else:
        fmt = struct.pack(
            "<HHIIHH", tag, ch, sample_rate, sample_rate * block, block,
            bits,
        )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        # RIFF chunks pad to even offsets; G.711 mono with odd n is the
        # first format here whose data chunk can be odd (round-14)
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → ((n, channels) float64 in [-1, 1], sample_rate).

    Walks the chunk list (tolerating LIST/INFO and other metadata
    chunks, including the spec's odd-size padding byte), supports
    integer PCM at 8/16/32 bits (tag 1), IEEE float at 32/64 bits
    (tag 3), and G.711 A-law/µ-law (tags 6/7 — exact integer
    companding tables, scaled /32768 like 16-bit PCM; round-14), each
    also in its WAVE_FORMAT_EXTENSIBLE form (tag 0xFFFE routed by the
    standard SubFormat GUID; round-15) — anything else (ADPCM,
    non-standard GUIDs, container-padded sample depths) raises
    NotImplementedError naming the feature, the same honest-gate
    discipline as decode_image."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"not a RIFF/WAVE payload (magic {bytes(payload[:4])!r})"
        )
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    fmt = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_ext = body[16:]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise NotImplementedError("WAVE missing fmt/data chunk")
    tag, ch, rate, _, _, bits = fmt
    if tag == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE (round-15): the real format rides the
        # 16-byte SubFormat GUID — the standard media-subtype GUIDs
        # embed the classic tag in the first two bytes over a fixed
        # suffix.  Known subtypes route to the existing decode paths;
        # unknown GUIDs stay a named gate.  wValidBitsPerSample must
        # equal the container depth (24-in-32 container padding is a
        # different decode and stays gated with ADPCM).
        if len(fmt_ext) < 24:
            raise ValueError(
                "WAVE extensible fmt chunk missing its extension"
            )
        (cb,) = struct.unpack("<H", fmt_ext[:2])
        if cb < 22:
            raise ValueError(f"WAVE extensible cbSize {cb} < 22")
        (valid_bits,) = struct.unpack("<H", fmt_ext[2:4])
        guid = fmt_ext[8:24]
        if guid[2:] != (
            b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        ):
            raise NotImplementedError(
                f"WAVE extensible SubFormat GUID {guid.hex()} "
                "is not a standard media subtype"
            )
        (tag,) = struct.unpack("<H", guid[:2])
        if valid_bits not in (0, bits):
            raise NotImplementedError(
                f"WAVE extensible valid bits {valid_bits} != container "
                f"{bits} (sample padding)"
            )
    if tag not in (1, 3, 6, 7):
        raise NotImplementedError(
            f"WAVE format tag {tag} unsupported (integer PCM 1, "
            "IEEE float 3, G.711 A-law 6 / µ-law 7 only, plus their "
            "extensible-GUID forms)"
        )
    if tag == 3:
        if bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"IEEE float bit depth {bits}")
    elif tag in (6, 7):
        if bits != 8:
            raise NotImplementedError(
                f"G.711 tag {tag} with bit depth {bits}"
            )
        dec = _alaw_decode if tag == 6 else _mulaw_decode
        arr = dec(np.frombuffer(data, dtype=np.uint8)).astype(
            np.float64
        ) / 32768.0
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:  # 8-bit WAV is unsigned per the spec
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 32:
        arr = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"PCM bit depth {bits} unsupported")
    n = (len(arr) // ch) * ch
    return arr[:n].reshape(-1, ch), rate


def audio_features(
    samples: np.ndarray, sample_rate: int, dim: int = 8
) -> list[float]:
    """Deterministic real features from decoded PCM: duration (s), RMS,
    zero-crossing rate, then mean spectral magnitude in (dim − 3)
    equal-width bands of the mono mix's rFFT (numpy — no scipy),
    band-normalized to sum 1.  Same contract as image_features: not a
    learned embedding, but a REAL function of the signal content."""
    mono = np.asarray(samples, dtype=np.float64).mean(axis=1)
    n = len(mono)
    if n == 0:
        return [0.0] * dim
    rms = float(np.sqrt((mono**2).mean()))
    zcr = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()) if n > 1 else 0.0
    base = [n / float(sample_rate), rms, zcr]
    n_bands = max(dim - len(base), 0)
    if n_bands:
        mag = np.abs(np.fft.rfft(mono))
        bands = [
            float(b.mean()) if len(b) else 0.0
            for b in np.array_split(mag, n_bands)
        ]
        total = sum(bands)
        if total > 0:
            bands = [b / total for b in bands]
        base += bands
    return base[:dim]


def video_features(frames: np.ndarray, fps: tuple, dim: int = 8) -> list[float]:
    """Deterministic real features from decoded frames: duration (s),
    frame count (log-scaled), mean inter-frame luminance delta (the
    motion proxy), then the MIDDLE frame's image features for the
    remaining dims — a real function of the clip content, same contract
    as image/audio_features."""
    n = frames.shape[0]
    if n == 0:
        return [0.0] * dim
    rate = fps[0] / max(fps[1], 1)
    luma = (
        0.2126 * frames[..., 0].astype(np.float64)
        + 0.7152 * frames[..., 1]
        + 0.0722 * frames[..., 2]
    ) / 255.0
    motion = (
        float(np.abs(np.diff(luma, axis=0)).mean()) if n > 1 else 0.0
    )
    base = [n / rate if rate else 0.0, float(np.log1p(n)), motion]
    rest = max(dim - len(base), 0)
    if rest:
        base += image_features(frames[n // 2], rest)
    return base[:dim]


def media_features(payload: bytes, dim: int = 8) -> list[float]:
    """Magic-sniffing feature extraction across modalities: RIFF/WAVE →
    :func:`audio_features`, YUV4MPEG2 → :func:`video_features`,
    everything else → image path (:func:`decode_image` +
    :func:`image_features`).  One interface for ``extract_features``'s
    real path, one honest NotImplementedError for payloads no route can
    decode."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return audio_features(*decode_wav(payload), dim=dim)
    if payload[:9] == b"YUV4MPEG2":
        return video_features(*decode_y4m(payload), dim=dim)
    return image_features(decode_image(payload), dim)


def _rgb_to_yuv_jpeg(frame: np.ndarray):
    """(H, W, 3) uint8 RGB → full-range BT.601 (JPEG) Y/U/V float planes."""
    r, g, b = (frame[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, u, v


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """(n, H, W, 3) uint8 RGB → YUV4MPEG2 bytes (C420jpeg: full-range
    BT.601 with 2×2-mean chroma subsampling — the mjpegtools format
    spec).  H and W must be even (4:2:0 requirement).  The encode side
    exists so tests can synthesize REAL video bytes, mirroring
    encode_bmp/encode_wav."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"expected (n, H, W, 3) uint8, got {arr.shape}")
    n, h, w, _ = arr.shape
    if h % 2 or w % 2:
        raise ValueError(f"4:2:0 needs even dims, got {h}x{w}")
    out = [
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode()
    ]
    for f in arr:
        y, u, v = _rgb_to_yuv_jpeg(f)
        usub = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        vsub = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        out.append(b"FRAME\n")
        for plane in (y, usub, vsub):
            out.append(
                np.clip(np.round(plane), 0, 255).astype(np.uint8).tobytes()
            )
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 → ((n, H, W, 3) uint8 RGB, (fps_num, fps_den)).

    Parses the space-separated header parameters (W/H/F required,
    unknown tags skipped per the spec), accepts the C420 family
    (420jpeg/420mpeg2/420paldv — identical plane layout, differing only
    in chroma siting, which nearest-siting upsampling ignores) and
    C444; other colorspaces raise NotImplementedError.  Full-range
    BT.601 conversion back to RGB, chroma upsampled by replication."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            f"not a YUV4MPEG2 payload (magic {bytes(payload[:9])!r}); "
            "native video support covers y4m — use ffmpeg for containers"
        )
    nl = payload.index(b"\n")
    w = h = None
    fps = (25, 1)
    cs = "420jpeg"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps = (int(num), int(den))
        elif t[0] == "C":
            cs = t[1:]
    if w is None or h is None:
        raise NotImplementedError("y4m header missing W/H")
    if cs.startswith("420"):
        chroma_shape = (h // 2, w // 2)
    elif cs == "444":
        chroma_shape = (h, w)
    else:
        raise NotImplementedError(f"y4m colorspace C{cs} unsupported")
    ylen = h * w
    clen = chroma_shape[0] * chroma_shape[1]
    pos = nl + 1
    frames = []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError(
                f"y4m frame {len(frames)}: FRAME header at byte {pos} has "
                "no terminating newline (truncated payload)"
            )
        if payload[pos : pos + 5] != b"FRAME":
            raise NotImplementedError("malformed y4m FRAME marker")
        pos = fnl + 1
        need = ylen + 2 * clen
        avail = len(payload) - pos
        if avail < need:
            raise ValueError(
                f"y4m frame {len(frames)} truncated: expected {need} "
                f"plane bytes, {avail} available"
            )
        y = np.frombuffer(payload, np.uint8, ylen, pos).reshape(h, w)
        u = np.frombuffer(payload, np.uint8, clen, pos + ylen).reshape(
            chroma_shape
        )
        v = np.frombuffer(
            payload, np.uint8, clen, pos + ylen + clen
        ).reshape(chroma_shape)
        pos += ylen + 2 * clen
        if cs.startswith("420"):
            u = u.repeat(2, axis=0).repeat(2, axis=1)
            v = v.repeat(2, axis=0).repeat(2, axis=1)
        yf = y.astype(np.float64)
        uf = u.astype(np.float64) - 128.0
        vf = v.astype(np.float64) - 128.0
        rgb = np.stack(
            [
                yf + 1.402 * vf,
                yf - 0.344136 * uf - 0.714136 * vf,
                yf + 1.772 * uf,
            ],
            axis=-1,
        )
        frames.append(np.clip(np.round(rgb), 0, 255).astype(np.uint8))
    return np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8), fps
