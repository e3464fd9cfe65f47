"""Multimodal columns: opaque binary media + typed metadata.

Design for image/audio/video at 100 TB:

- media is an opaque ``binary`` column plus a typed metadata struct
  (``media_type``, ``byte_len``, ``sha256``) — rows stay columnar,
  Parquet stores the blobs page-compressed, and metadata predicates
  (type/size filters) prune without touching the bytes;
- decode / feature-extract / resize / frame-sample run as
  Arrow-batched functions over ``mapInPandas`` — one Python worker
  per partition, whole batches in Arrow, never a row-at-a-time UDF;
- partitioning: blobs are heavy, so upstream repartition targets
  bytes-per-partition, not rows (``target_partitions`` helper).

Compressed-codec libraries (PIL/ffmpeg/librosa) are NOT in this
container, so entropy-coded formats (JPEG, MP3, H.264) stay a
documented seam — but ``decode_image`` is REAL for everything a
pure-Python parser can own: PPM (P6), PGM (P5), 24-bit BI_RGB BMP,
and since round 6 PNG (8-bit gray/RGB/RGBA; paletted color-type 3
with PLTE lookup since round 8; Adam7-interlaced and true 16-bit
streams since round 9) via stdlib zlib inflate plus the full
five-branch scanline unfilter.
``decode_images`` runs it over the standard Arrow-batched
``mapInPandas`` path and is oracle-checked end-to-end on
deterministic synthetic bytes (``synth_images`` / ``synth_pngs``);
swapping the parser body for PIL calls would change no plan or
schema. ``fake_decode_meta`` remains the plumbing stub for formats
the container cannot decode.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, byte_len int, sha256 string, "
    "fake_width int, fake_height int"
)


def _spread(df: DataFrame) -> DataFrame:
    """Spread rows across the cluster before CPU-heavy per-row Python
    codec work (similarity.fan_out's reasoning, applied to the media
    stages): the documents table arrives as few parquet files and a
    scan cannot split below row-group granularity, so without this
    every mapInPandas synth/encode/decode chain runs on as many cores
    as there are input splits — ONE, at the bench scales (measured:
    the whole JPEG synth+decode pipeline serialized on a single
    Python worker, 4.9 s for work that is ~0.15 s spread over the
    local cores). The shuffled rows are just ids (a few bytes each);
    at 100 TB the same repartition keeps per-task codec work balanced
    across executors. Each row is processed independently, so
    placement cannot change any value."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from text bytes (the offline stand-in for
    real image/audio ingestion): binary content + typed metadata."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        content.alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.col(text_col)).alias("byte_len"),
        F.sha2(content, 256).alias("sha256"),
    )


# ---------------------------------------------------------------------------
# Real image codecs. Uncompressed formats (PPM/PGM/BMP) a pure-Python
# parser can own outright; PNG is a REAL compressed container decoded
# with stdlib zlib (inflate) + a full spec unfilter pass — no image
# library needed. JPEG (DCT entropy coding) remains the library-gated
# seam.
# ---------------------------------------------------------------------------

def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """P6 binary PPM: ASCII header + raw row-major RGB bytes
    (len(pixels) == 3*width*height)."""
    if len(pixels) != 3 * width * height:
        raise ValueError("P6 needs 3*w*h pixel bytes")
    return f"P6\n{width} {height}\n255\n".encode() + pixels


def encode_pgm(width: int, height: int, pixels: bytes) -> bytes:
    """P5 binary PGM (grayscale): header + raw w*h bytes."""
    if len(pixels) != width * height:
        raise ValueError("P5 needs w*h pixel bytes")
    return f"P5\n{width} {height}\n255\n".encode() + pixels


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP from row-major RGB bytes:
    rows are written bottom-up in BGR order, padded to 4 bytes —
    the standard Windows DIB layout."""
    import struct

    if len(pixels) != 3 * width * height:
        raise ValueError("24-bit BMP needs 3*w*h pixel bytes")
    row_pad = (-3 * width) % 4
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = pixels[3 * width * r : 3 * width * (r + 1)]
        for c in range(width):  # RGB -> BGR
            body += bytes((row[3 * c + 2], row[3 * c + 1], row[3 * c]))
        body += b"\x00" * row_pad
    header_len = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_len + len(body), 0, 0, header_len)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> sample count (bit depth 8 only): 0=grayscale,
#: 0=grayscale, 2=truecolor RGB, 4=gray+alpha, 6=truecolor+alpha;
#: palette (3) decodes through PLTE (+tRNS alpha), Adam7 interlacing
#: through the pass grid, 16-bit through the two-byte sample path.
#: Sub-8-bit GRAYSCALE and key-color transparency stay out of scope.
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG spec Paeth predictor (left, up, upper-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    filter_for_row=None,
) -> bytes:
    """Spec-conforming non-interlaced 8-bit PNG (gray/RGB/RGBA).

    ``filter_for_row(r) -> 0..4`` picks the scanline filter (default:
    rotate ``r % 5`` so every filter type — None/Sub/Up/Average/Paeth
    — appears in any image taller than 4 rows). Rotating filters is
    deliberately adversarial: a decoder whose unfilter pass is wrong
    in ANY branch produces wrong reconstructed samples and fails the
    oracle's pixel checksum, where all-zero filters would mask it.
    """
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if len(pixels) != channels * width * height:
        raise ValueError("PNG needs channels*w*h pixel bytes")
    pick = filter_for_row if filter_for_row is not None else (lambda r: r % 5)
    bpp, stride = channels, channels * width
    raw = bytearray()
    prior = bytes(stride)
    for r in range(height):
        row = pixels[stride * r : stride * (r + 1)]
        ftype = pick(r) % 5
        raw.append(ftype)
        for x in range(stride):
            left = row[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            pred = (
                0 if ftype == 0
                else left if ftype == 1
                else up if ftype == 2
                else (left + up) // 2 if ftype == 3
                else _paeth(left, up, ul)
            )
            raw.append((row[x] - pred) & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _pack_indices(indices, depth: int) -> bytes:
    """depth-bit MSB-first packing of one scanline of palette
    indices (identity at depth 8); trailing bits zero-padded per
    spec."""
    if depth == 8:
        return bytes(indices)
    per = 8 // depth
    out = bytearray((len(indices) * depth + 7) // 8)
    for i, v in enumerate(indices):
        out[i // per] |= v << (8 - depth * (i % per + 1))
    return bytes(out)


def encode_png_palette(
    width: int,
    height: int,
    indices: bytes,
    palette: list[tuple[int, int, int]],
    filter_for_row=None,
    depth: int = 8,
    trans: list[int] | None = None,
) -> bytes:
    """Spec-conforming non-interlaced PALETTED PNG (color type 3):
    one palette index per pixel at ``depth`` in (1, 2, 4, 8) bits —
    sub-8 depths pack MSB-first per spec — with a PLTE chunk of RGB
    triples and, when ``trans`` is given, a tRNS chunk of per-entry
    alphas (leading entries; the rest opaque). Filters rotate like
    :func:`encode_png` (bpp = 1 byte for indexed scanlines, per
    spec)."""
    import struct
    import zlib

    if depth not in (1, 2, 4, 8):
        raise ValueError(f"paletted PNG depth must be 1/2/4/8, got {depth}")
    if len(indices) != width * height:
        raise ValueError("paletted PNG needs w*h index bytes")
    if not 1 <= len(palette) <= 256:
        raise ValueError("PLTE needs 1..256 entries")
    if len(palette) > (1 << depth):
        raise ValueError(f"palette too large for depth {depth}")
    if any(i >= len(palette) for i in indices):
        raise ValueError("palette index out of range")
    if trans is not None and len(trans) > len(palette):
        raise ValueError("tRNS longer than PLTE")
    pick = filter_for_row if filter_for_row is not None else (lambda r: r % 5)
    stride = (width * depth + 7) // 8
    raw = bytearray()
    prior = bytes(stride)
    for r in range(height):
        row = _pack_indices(indices[width * r : width * (r + 1)], depth)
        ftype = pick(r) % 5
        raw.append(ftype)
        for x in range(stride):
            left = row[x - 1] if x >= 1 else 0
            up = prior[x]
            ul = prior[x - 1] if x >= 1 else 0
            pred = (
                0 if ftype == 0
                else left if ftype == 1
                else up if ftype == 2
                else (left + up) // 2 if ftype == 3
                else _paeth(left, up, ul)
            )
            raw.append((row[x] - pred) & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 3, 0, 0, 0)
    plte = b"".join(bytes(c) for c in palette)
    out = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
    )
    if trans is not None:
        out += _png_chunk(b"tRNS", bytes(trans))
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


#: Adam7 pass grid (PNG spec 8.2): per pass, (x_start, y_start,
#: x_step, y_step). Each pass is an independently FILTERED sub-image;
#: passes whose sub-image is empty for the geometry contribute no
#: bytes at all (not even filter bytes).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png_interlaced(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    filter_for_row=None,
    palette: list[tuple[int, int, int]] | None = None,
    depth: int = 8,
    trans: list[int] | None = None,
) -> bytes:
    """Spec-conforming Adam7-INTERLACED PNG (8- or 16-bit).

    Gray/RGB/RGBA via ``channels`` in (1, 3, 4); passing ``palette``
    makes ``pixels`` palette INDICES and writes color type 3 + PLTE
    (indexed scanlines pack at ``depth`` in (1, 2, 4, 8) bits and
    filter at bpp=1, per spec; ``trans`` adds the per-entry tRNS
    alpha chunk). ``depth=16`` takes ``pixels`` as big-endian 2-byte
    samples and filters at bpp = 2*channels — filters always operate
    on BYTES per spec. Each of the seven Adam7 passes is extracted
    from the row-major samples, then filtered as its own sub-image —
    filter bytes per PASS scanline, predictors referencing the
    pass's own previous scanline, empty passes emitting nothing.
    ``filter_for_row(seq)`` picks the filter for the seq-th emitted
    pass scanline (default rotate ``seq % 5``; same adversarial
    rationale as :func:`encode_png` — any wrong unfilter branch or
    wrong pass geometry corrupts reconstructed samples)."""
    import struct
    import zlib

    if palette is not None:
        if channels != 1:
            raise ValueError("paletted interlaced PNG needs channels=1")
        if depth not in (1, 2, 4, 8):
            raise ValueError(
                f"paletted PNG depth must be 1/2/4/8, got {depth}"
            )
        if not 1 <= len(palette) <= 256:
            raise ValueError("PLTE needs 1..256 entries")
        if len(palette) > (1 << depth):
            raise ValueError(f"palette too large for depth {depth}")
        if any(i >= len(palette) for i in pixels):
            raise ValueError("palette index out of range")
        if trans is not None and len(trans) > len(palette):
            raise ValueError("tRNS longer than PLTE")
        if len(pixels) != width * height:
            raise ValueError("paletted PNG needs w*h index bytes")
        color_type = 3
    else:
        if trans is not None:
            raise ValueError("trans requires a palette")
        if depth not in (8, 16):
            raise ValueError(f"unsupported PNG bit depth {depth}")
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        if len(pixels) != channels * (depth // 8) * width * height:
            raise ValueError("PNG needs channels*w*h*depth/8 pixel bytes")
    px_bytes = channels * (depth // 8)  # 0 for sub-8-bit indexed
    pick = filter_for_row if filter_for_row is not None else (lambda r: r % 5)
    bpp = max(1, px_bytes)
    raw = bytearray()
    seq = 0
    for x0, y0, dx, dy in _ADAM7:
        xs = range(x0, width, dx)
        ys = range(y0, height, dy)
        if not xs or not ys:
            continue
        prior = None
        for y in ys:
            if color_type == 3:
                row = _pack_indices(
                    bytes(pixels[y * width + x] for x in xs), depth
                )
            else:
                row = bytearray()
                for x in xs:
                    o = (y * width + x) * px_bytes
                    row += pixels[o : o + px_bytes]
            stride = len(row)
            if prior is None:
                prior = bytes(stride)
            ftype = pick(seq) % 5
            seq += 1
            raw.append(ftype)
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                pred = (
                    0 if ftype == 0
                    else left if ftype == 1
                    else up if ftype == 2
                    else (left + up) // 2 if ftype == 3
                    else _paeth(left, up, ul)
                )
                raw.append((row[x] - pred) & 0xFF)
            prior = bytes(row)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, 1
    )
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", b"".join(bytes(c) for c in palette))
        if trans is not None:
            out += _png_chunk(b"tRNS", bytes(trans))
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png16(
    width: int,
    height: int,
    samples: list[int],
    channels: int = 3,
    filter_for_row=None,
) -> bytes:
    """Spec-conforming non-interlaced 16-BIT PNG (gray/RGB/RGBA):
    row-major samples 0..65535 stored big-endian, scanlines filtered
    at bpp = 2*channels bytes (PNG filters operate on BYTES at every
    depth). Rotating per-row filters like :func:`encode_png`."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if len(samples) != channels * width * height:
        raise ValueError("PNG needs channels*w*h samples")
    if any(not 0 <= v <= 0xFFFF for v in samples):
        raise ValueError("16-bit PNG samples must be 0..65535")
    pixels = struct.pack(f">{len(samples)}H", *samples)
    pick = filter_for_row if filter_for_row is not None else (lambda r: r % 5)
    bpp = 2 * channels
    stride = bpp * width
    raw = bytearray()
    prior = bytes(stride)
    for r in range(height):
        row = pixels[stride * r : stride * (r + 1)]
        ftype = pick(r) % 5
        raw.append(ftype)
        for x in range(stride):
            left = row[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            pred = (
                0 if ftype == 0
                else left if ftype == 1
                else up if ftype == 2
                else (left + up) // 2 if ftype == 3
                else _paeth(left, up, ul)
            )
            raw.append((row[x] - pred) & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 16, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(content: bytes, want_pixels: bool = False) -> dict:
    """Real PNG decode on stdlib only: chunk walk with CRC checks,
    zlib inflate of the concatenated IDAT stream, and the full
    five-branch unfilter reconstruction from the spec. 8-bit paletted
    images (color type 3) decode through the PLTE lookup to RGB
    samples, so downstream stages see one layout. Adam7-INTERLACED
    streams (interlace=1) reconstruct through the seven-pass grid:
    each pass unfilters as its own sub-image (predictors reference
    the pass's previous scanline), then scatters into the full-size
    row-major buffer. 16-BIT streams (gray/RGB/RGBA, plain or
    interlaced) unfilter at bpp = 2*channels bytes and checksum over
    the true big-endian sample VALUES. Returns the same shape as
    :func:`decode_image` (geometry + order-invariant pixel-sample
    checksum) plus ``bit_depth``; ``want_pixels`` adds the
    reconstructed row-major samples (for the resample stage; 8-bit
    depths only — the 16-bit resample path stays out of scope).
    Sub-8-bit INDEXED (depths 1/2/4) expands through the palette LUT
    and paletted tRNS alpha decodes to RGBA; the only remaining
    NotImplementedError guards are sub-8-bit GRAYSCALE and
    gray/truecolor key-color tRNS — documented scope, not stubs."""
    import struct
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG signature")
    pos, n = 8, len(content)
    width = height = None
    channels, color_type, palette, trans = 0, None, None, None
    interlace = 0
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        if pos + 12 + length > n:
            # a short body slice would otherwise make the CRC
            # unpack_from read past the buffer and raise struct.error,
            # breaking the ValueError parse-error contract
            raise ValueError(f"PNG chunk {ctype!r} truncated")
        body = content[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if color_type not in _PNG_CHANNELS and color_type != 3:
                raise NotImplementedError(
                    f"PNG color_type={color_type}: only "
                    "gray/RGB/RGBA/paletted supported"
                )
            if color_type == 3:
                if depth not in (1, 2, 4, 8):
                    # indexed depth is 1/2/4/8 per spec (16 invalid)
                    raise ValueError(
                        f"PNG paletted depth={depth} is spec-invalid"
                    )
            elif depth in (1, 2, 4):
                if color_type == 0:
                    raise NotImplementedError(
                        "PNG sub-8-bit GRAYSCALE not supported"
                    )
                raise ValueError(
                    f"PNG depth={depth} color_type={color_type}"
                    " is spec-invalid"
                )
            elif depth not in (8, 16):
                raise NotImplementedError(
                    f"PNG depth={depth}: only 8/16-bit supported"
                )
            if interlace not in (0, 1):
                raise ValueError(f"PNG bad interlace method {interlace}")
            # indexed scanlines carry depth-bit PACKED indices
            # (MSB-first); LUT expansion happens after unfilter.
            # 16-bit samples are two bytes each. Filters operate on
            # BYTES at every depth, so bpp/stride below count bytes.
            channels = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
            sample_bytes = depth // 8  # 0 for sub-8-bit indexed
            bits_pp = depth if color_type == 3 else depth * channels
        elif ctype == b"PLTE":
            if len(body) % 3 or not 3 <= len(body) <= 768:
                raise ValueError("PNG PLTE length invalid")
            palette = [tuple(body[j : j + 3]) for j in range(0, len(body), 3)]
        elif ctype == b"tRNS":
            if color_type == 3:
                # paletted alpha: one byte per leading palette entry,
                # missing entries fully opaque -> decode to RGBA
                trans = list(body)
            else:
                raise NotImplementedError(
                    "PNG tRNS key-color transparency (gray/truecolor)"
                    " not supported — only paletted alpha decodes"
                    " (to RGBA)"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    else:
        # ran off the end mid-header (fewer than 8 bytes left) —
        # a truncated stream, same contract as a truncated body
        raise ValueError("PNG stream truncated before IEND")
    if width is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT stream corrupt: {exc}") from exc
    px_bytes = channels * sample_bytes  # whole bytes/pixel (0 if sub-8)
    stride = (width * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)  # filter distance is >= 1 byte per spec
    out_channels = channels
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        if trans is not None:
            if len(trans) > len(palette):
                raise ValueError("PNG tRNS longer than PLTE")
            alphas = list(trans) + [255] * (len(palette) - len(trans))
            pal_bytes = [
                bytes(c) + bytes([a]) for c, a in zip(palette, alphas)
            ]
            out_channels = 4  # RGBA expansion keeps the alpha exact
        else:
            pal_bytes = [bytes(c) for c in palette]
            out_channels = 3

    def unpack_indices(rowbytes, npix: int) -> bytes:
        """depth-bit MSB-first packed palette indices -> one byte per
        pixel (identity at depth 8)."""
        if depth == 8:
            return bytes(rowbytes[:npix])
        per = 8 // depth
        mask = (1 << depth) - 1
        out = bytearray(npix)
        for i in range(npix):
            out[i] = (
                rowbytes[i // per] >> (8 - depth * (i % per + 1))
            ) & mask
        return bytes(out)

    def unfilter(pos: int, stride: int, nrows: int):
        """Spec unfilter of ``nrows`` scanlines of ``stride`` bytes
        starting at ``pos`` in the inflated stream — used once for
        the whole image (interlace 0) or once per Adam7 pass
        sub-image (predictors reference only the pass's own previous
        scanline)."""
        rows = []
        prior = bytearray(stride)
        for _ in range(nrows):
            if pos + 1 + stride > len(raw):
                raise ValueError("PNG scanline data length mismatch")
            ftype = raw[pos]
            if ftype > 4:
                raise ValueError(f"PNG bad filter type {ftype}")
            row = bytearray(raw[pos + 1 : pos + 1 + stride])
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                pred = (
                    0 if ftype == 0
                    else left if ftype == 1
                    else up if ftype == 2
                    else (left + up) // 2 if ftype == 3
                    else _paeth(left, up, ul)
                )
                row[x] = (row[x] + pred) & 0xFF
            rows.append(row)
            prior = row
            pos += stride + 1
        return rows, pos

    if interlace == 0:
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG scanline data length mismatch")
        full_rows, _ = unfilter(0, stride, height)
        if color_type == 3:
            # rows become one-INDEX-per-pixel (unpacks sub-8 packing)
            full_rows = [unpack_indices(r, width) for r in full_rows]
    elif color_type == 3:
        # Adam7 over indexed pixels: unfilter each pass at ITS packed
        # stride, unpack to indices, scatter indices through the grid
        img = bytearray(width * height)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            xs = range(x0, width, dx)
            ys = range(y0, height, dy)
            if not xs or not ys:
                continue  # empty pass: zero bytes in the stream
            pstride = (len(xs) * bits_pp + 7) // 8
            prows, p = unfilter(p, pstride, len(ys))
            for yi, y in enumerate(ys):
                idxs = unpack_indices(prows[yi], len(xs))
                base = y * width
                for xi, x in enumerate(xs):
                    img[base + x] = idxs[xi]
        if p != len(raw):
            raise ValueError("PNG scanline data length mismatch")
        full_rows = [
            bytes(img[r * width : (r + 1) * width]) for r in range(height)
        ]
    else:
        # Adam7: unfilter each pass sub-image, scatter into the
        # full-size row-major buffer via the pass grid
        img = bytearray(stride * height)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            xs = range(x0, width, dx)
            ys = range(y0, height, dy)
            if not xs or not ys:
                continue  # empty pass: zero bytes in the stream
            prows, p = unfilter(p, px_bytes * len(xs), len(ys))
            for yi, y in enumerate(ys):
                prow = prows[yi]
                base = y * stride
                for xi, x in enumerate(xs):
                    img[base + x * px_bytes : base + (x + 1) * px_bytes] = (
                        prow[xi * px_bytes : (xi + 1) * px_bytes]
                    )
        if p != len(raw):
            raise ValueError("PNG scanline data length mismatch")
        full_rows = [
            img[r * stride : (r + 1) * stride] for r in range(height)
        ]

    total = 0
    pixels = bytearray()
    for row in full_rows:
        if color_type == 3:
            # LUT expansion: rows are palette INDICES (one byte per
            # pixel after unpack); downstream sees plain RGB — or
            # RGBA when tRNS recorded per-entry alpha
            try:
                expanded = b"".join(pal_bytes[ix] for ix in row)
            except IndexError:
                raise ValueError("PNG palette index out of range") from None
            total += sum(expanded)
            if want_pixels:
                pixels += expanded
        elif sample_bytes == 2:
            # 16-bit: checksum over the true big-endian SAMPLE values
            # (byte sums would pass a decoder that swaps endianness)
            total += sum(
                struct.unpack(f">{len(row) // 2}H", bytes(row))
            )
            if want_pixels:
                raise NotImplementedError(
                    "16-bit PNG sample export (the 8-bit resample "
                    "path) out of scope; pixel_sum is exact over the "
                    "16-bit values"
                )
        else:
            total += sum(row)
            if want_pixels:
                pixels += row
    out = {
        "img_format": "png", "width": width, "height": height,
        "channels": out_channels,
        "bit_depth": depth,
        "pixel_sum": total,
    }
    if want_pixels:
        out["pixels"] = bytes(pixels)
    return out


def _parse_pnm_header(content: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, data_offset) of a binary PNM header;
    handles '#' comments and arbitrary whitespace per the netpbm
    spec."""
    pos, tokens = 2, []
    n = len(content)
    while len(tokens) < 3:
        while pos < n and content[pos : pos + 1].isspace():
            pos += 1
        if pos < n and content[pos : pos + 1] == b"#":
            while pos < n and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    return tokens[0], tokens[1], tokens[2], pos + 1  # single ws after maxval


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW compression: longest-known-prefix emit + extend,
    variable-width LSB-first codes, dictionary growth, CLEAR on a
    full table. Width convention: the DECODER can only have added
    n-1 entries when it reads the encoder's code n (it rebuilds one
    step behind), so the encoder bumps when its next-to-assign
    reaches 2^width + 1 while the decoder bumps at 2^width — the
    classic one-off asymmetry every GIF codec pair carries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0
    width = min_code_size + 1
    nxt = eoi + 1

    def emit(c: int) -> None:
        nonlocal acc, bits
        acc |= c << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if nxt < 4096:
            table[wk] = nxt
            nxt += 1
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Real GIF LZW decompression: LSB-first variable-width code
    stream, dictionary rebuild, the KwKwK special case, CLEAR
    handling, and the same width-bump convention as the encoder.
    Stops at EOI or after ``n_expected`` pixels; anything
    inconsistent is a ValueError (parse-error contract)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    nxt = eoi + 1
    out = bytearray()
    acc = bits = 0
    prev: bytes | None = None
    pos = 0
    while len(out) < n_expected:
        while bits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << bits
            pos += 1
            bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            width = min_code_size + 1
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            nxt = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW: first code not a literal")
            entry = table[code]
        elif code < nxt:
            entry = table[code]
        elif code == nxt:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table")
        out += entry
        if prev is not None and nxt < 4096:
            table.append(prev + entry[:1])
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError(
            f"GIF LZW: decoded {len(out)} pixels, expected {n_expected}"
        )
    return bytes(out)


def _gif_interlace_rows(height: int) -> list[int]:
    """GIF 4-pass interlace row order (spec appendix E): the display
    rows in the order they are STORED — pass 1 every 8th row from 0,
    pass 2 every 8th from 4, pass 3 every 4th from 2, pass 4 every
    2nd from 1."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: list[tuple[int, int, int]],
    interlaced: bool = False,
    local_palette: bool = False,
) -> bytes:
    """Spec-conforming GIF89a: logical screen descriptor, color
    table (padded to a power of two), one image descriptor, REAL
    LZW-compressed pixel data in 255-byte sub-blocks.

    ``interlaced`` stores the rows in the 4-pass interlace order and
    sets the image-descriptor interlace flag. ``local_palette``
    moves the color table into the image descriptor (local) and
    writes a DECOY global table with the entries reversed — a
    decoder that ignores the local table and falls back to the
    global one produces a wrong (not merely shuffled) sample sum."""
    import struct

    if len(indices) != width * height:
        raise ValueError("GIF needs w*h index bytes")
    if not 2 <= len(palette) <= 256:
        raise ValueError("GIF palette needs 2..256 entries")
    if any(i >= len(palette) for i in indices):
        raise ValueError("palette index out of range")
    depth = max(1, (max(len(palette) - 1, 1)).bit_length())
    table_size = 1 << depth
    ct = b"".join(bytes(c) for c in palette)
    ct += bytes(3 * (table_size - len(palette)))
    out = bytearray(b"GIF89a")
    if local_palette:
        decoy = b"".join(
            bytes(c) for c in reversed(palette)
        ) + bytes(3 * (table_size - len(palette)))
        packed = 0x80 | ((depth - 1) << 4) | (depth - 1)
        out += struct.pack("<HHBBB", width, height, packed, 0, 0)
        out += decoy
    else:
        packed = 0x80 | ((depth - 1) << 4) | (depth - 1)
        out += struct.pack("<HHBBB", width, height, packed, 0, 0)
        out += ct
    ipacked = 0
    if local_palette:
        ipacked |= 0x80 | (depth - 1)
    if interlaced:
        ipacked |= 0x40
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, ipacked)
    if local_palette:
        out += ct
    if interlaced:
        rows = [
            indices[r * width : (r + 1) * width]
            for r in _gif_interlace_rows(height)
        ]
        indices = b"".join(rows)
    min_code = max(2, depth)
    out.append(min_code)
    payload = lzw_encode(indices, min_code)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(content: bytes, want_pixels: bool = False) -> dict:
    """Real GIF decode on stdlib only: header + logical screen
    descriptor, color tables, block walk (plain extensions are
    skipped per spec), REAL LZW decompression of the image data, and
    palette expansion to RGB samples. Single-frame GIFs are in scope
    including INTERLACED row order (4-pass reorder back to display
    order — r10) and LOCAL color tables (the image descriptor's
    table overrides the global one — r10); GCE transparency raises
    NotImplementedError — documented scope, not a stub.
    ``want_pixels`` adds the row-major RGB samples."""
    import struct

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    if len(content) < 13:
        raise ValueError("GIF header truncated")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    palette: list[bytes] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(content):
            raise ValueError("GIF global color table truncated")
        palette = [content[pos + 3 * j : pos + 3 * j + 3] for j in range(n)]
        pos += 3 * n
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image data")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(content):
                raise ValueError("GIF extension truncated")
            label = content[pos]
            pos += 1
            sub_start = pos
            while True:
                if pos >= len(content):
                    raise ValueError("GIF extension truncated")
                ln = content[pos]
                pos += 1
                if ln == 0:
                    break
                pos += ln
            if label == 0xF9:  # graphic control: transparency flag
                flags = content[sub_start + 1] if pos - sub_start >= 2 else 0
                if flags & 0x01:
                    raise NotImplementedError(
                        "GIF transparency not supported (decoding to"
                        " RGB would silently drop it)"
                    )
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        if pos + 9 > len(content):
            raise ValueError("GIF image descriptor truncated")
        _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        if ipacked & 0x80:
            # local color table: overrides the global one per spec
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(content):
                raise ValueError("GIF local color table truncated")
            palette = [
                content[pos + 3 * j : pos + 3 * j + 3] for j in range(n)
            ]
            pos += 3 * n
        interlaced = bool(ipacked & 0x40)
        if not palette:
            raise ValueError("GIF image without a color table")
        if pos >= len(content):
            raise ValueError("GIF image data truncated")
        min_code = content[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"GIF bad LZW min code size {min_code}")
        payload = bytearray()
        while True:
            if pos >= len(content):
                raise ValueError("GIF image data truncated")
            ln = content[pos]
            pos += 1
            if ln == 0:
                break
            if pos + ln > len(content):
                raise ValueError("GIF sub-block truncated")
            payload += content[pos : pos + ln]
            pos += ln
        idx = lzw_decode(bytes(payload), min_code, iw * ih)
        bad = next((i for i in idx if i >= len(palette)), None)
        if bad is not None:
            raise ValueError("GIF palette index out of range")
        if interlaced:
            # stored rows are in 4-pass order; scatter back to
            # display (row-major) order
            disp = bytearray(iw * ih)
            for stored, display in enumerate(_gif_interlace_rows(ih)):
                disp[display * iw : (display + 1) * iw] = idx[
                    stored * iw : (stored + 1) * iw
                ]
            idx = bytes(disp)
        total = sum(sum(palette[i]) for i in idx)
        out = {
            "img_format": "gif", "width": iw, "height": ih,
            "channels": 3, "pixel_sum": total,
        }
        if want_pixels:
            out["pixels"] = b"".join(palette[i] for i in idx)
        return out
    raise ValueError("GIF stream truncated before image data")


def decode_image(content: bytes) -> dict:
    """Decode an image container: P6 PPM (RGB), P5 PGM (gray),
    24-bit BI_RGB BMP, non-interlaced 8-bit PNG (gray/RGB/RGBA/
    paletted — real zlib inflate + unfilter, :func:`decode_png`),
    single-frame GIF (real LZW, :func:`decode_gif` — round 8),
    baseline sequential JPEG (real Huffman + dequant + IDCT + YCbCr,
    :func:`decode_jpeg` — a stdlib-only codec since round 7), or
    QOI (all six op families, :func:`decode_qoi` — round 10).
    Returns format, geometry, channel count, and the sum of all
    pixel-sample bytes (an order-invariant content checksum the
    oracle recomputes). Progressive/subsampled/12-bit JPEG raises
    NotImplementedError — documented scope, not a stub."""
    import struct

    if content[:8] == _PNG_SIG:
        return decode_png(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(content)
    if content[:2] == b"\xff\xd8":
        return decode_jpeg(content)
    if content[:4] == b"qoif":
        return decode_qoi(content)
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(content)
    if len(content) >= 26 and content[-26:] == _TGA_FOOTER:
        return decode_tga(content)
    if content[:2] in (b"P6", b"P5"):
        w, h, maxval, off = _parse_pnm_header(content)
        ch = 3 if content[:2] == b"P6" else 1
        n_bytes = ch * w * h * (2 if maxval > 255 else 1)
        pix = content[off : off + n_bytes]
        if len(pix) != n_bytes:
            raise ValueError("truncated PNM pixel data")
        return {
            "img_format": "ppm" if ch == 3 else "pgm",
            "width": w, "height": h, "channels": ch,
            "pixel_sum": sum(pix),
        }
    if content[:2] == b"BM":
        data_off = struct.unpack_from("<I", content, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", content, 14)
        planes, bpp = struct.unpack_from("<HH", content, 26)
        compression = struct.unpack_from("<I", content, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"only 24-bit BI_RGB BMP supported (bpp={bpp}, "
                f"compression={compression})"
            )
        top_down = h < 0
        h = abs(h)
        row_bytes, row_pad = 3 * w, (-3 * w) % 4
        total = 0
        pos = data_off
        for _ in range(h):
            row = content[pos : pos + row_bytes]
            if len(row) != row_bytes:
                raise ValueError("truncated BMP pixel data")
            total += sum(row)
            pos += row_bytes + row_pad
        return {
            "img_format": "bmp", "width": w, "height": h,
            "channels": 3, "pixel_sum": total,
        }
    raise NotImplementedError(
        "unrecognized image container (only PNM/BMP/PNG/JPEG are "
        "implemented stdlib-only in this environment)"
    )


# ---------------------------------------------------------------------------
# Baseline sequential JPEG — a real stdlib-only codec (round 7).
#
# Scope: ITU-T T.81 baseline DCT (SOF0), 8-bit samples, grayscale or
# YCbCr 4:4:4 (no chroma subsampling), standard JFIF color transform,
# restart markers honored. Progressive (SOF2), arithmetic coding,
# 12-bit, and subsampled scans raise NotImplementedError — documented
# scope, not a stub. The Huffman table construction, zigzag order,
# and the typical Huffman tables below are the public spec's
# (T.81 Annex K).
#
# Reference parity: the reference pipeline treats media as opaque
# blobs; this codec exists for the LLM-curation extension surface
# (multimodal decode on the Arrow mapInPandas shape), same rationale
# as decode_png (scripts/bronze-silver.py carries no media ops).
# ---------------------------------------------------------------------------

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K "typical" Huffman tables: (bits[1..16], huffval)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _huff_codes(bits, huffval):
    """Canonical Huffman: symbol -> (code, length). T.81 C.2."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_cos():
    import math

    return [
        [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)
    ]


def _fdct_quant(block, quant):
    """Forward 8x8 DCT of level-shifted samples, quantized to ints
    (round half away from zero, like every reference encoder).

    Constant blocks (every real encoder's flat-region case, and all
    of synth_jpegs' fixtures) take an exact O(1) fast path: the DC
    accumulator is a sum of 64 identical small integers (exact in
    float, replicated verbatim below with the loop's own association
    order), and every AC accumulator is a cosine-row sum that is
    mathematically zero and numerically ~1e-13, which quantizes to 0
    under floor(|q| + 0.5) for any quant step >= 1 — so the fast
    path's quantized output is bit-identical to the loop's."""
    import math

    s0 = block[0]
    if all(b == s0 for b in block):
        cu = cv = 1 / math.sqrt(2)
        f = 0.25 * cu * cv * float(64 * (s0 - 128))
        q = f / quant[0]
        out = [0] * 64
        out[0] = int(math.floor(abs(q) + 0.5)) * (1 if q >= 0 else -1)
        return out

    C = _dct_cos()
    shifted = [s - 128 for s in block]
    out = []
    for v in range(8):
        for u in range(8):
            acc = 0.0
            for y in range(8):
                cy = C[v][y]
                base = y * 8
                for x in range(8):
                    acc += shifted[base + x] * C[u][x] * cy
            cu = (1 / math.sqrt(2)) if u == 0 else 1.0
            cv = (1 / math.sqrt(2)) if v == 0 else 1.0
            f = 0.25 * cu * cv * acc
            q = f / quant[v * 8 + u]
            out.append(int(math.floor(abs(q) + 0.5)) * (1 if q >= 0 else -1))
    return out


def _idct(coef):
    """Inverse 8x8 DCT -> clamped 8-bit samples; rounding is
    floor(x + 0.5) (never Python's bankers' round), so the SQL
    oracle can replay it exactly.

    DC-only blocks (flat regions; all of synth_jpegs' fixtures) take
    an exact O(1) fast path: with every AC coefficient zero the
    loop's accumulator is exactly the single (v=0, u=0) term — the
    zero terms add 0.0, which never changes a float — so computing
    that one product with the loop's own association order yields
    the identical 64x-replicated sample."""
    import math

    if not any(coef[1:]):
        cu = cv = 1 / math.sqrt(2)
        acc = ((cu * (1.0 * cv)) * coef[0]) * 1.0
        s = int(math.floor(0.25 * acc + 128.0 + 0.5))
        s = 0 if s < 0 else 255 if s > 255 else s
        return [s] * 64

    C = _dct_cos()
    out = []
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                cv = (1 / math.sqrt(2)) if v == 0 else 1.0
                cyv = C[v][y] * cv
                base = v * 8
                for u in range(8):
                    cu = (1 / math.sqrt(2)) if u == 0 else 1.0
                    acc += cu * cyv * coef[base + u] * C[u][x]
            s = int(math.floor(0.25 * acc + 128.0 + 0.5))
            out.append(0 if s < 0 else 255 if s > 255 else s)
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


def _mag_bits(v: int):
    """(size category, appended bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JFIF encoder, stdlib only: level shift ->
    8x8 forward DCT -> all-ones quantization (lossless-but-for-DCT
    rounding; the fixture generator leans on this) -> zigzag ->
    Annex-K Huffman entropy coding. Grayscale (1) or YCbCr 4:4:4
    (3). Dimensions need not be block-aligned — edge replication
    pads. ``restart_interval`` > 0 emits DRI and RSTn markers every
    that many MCUs (resetting DC predictors), exercising the
    decoder's resynchronization path."""
    import struct

    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    quant = [1] * 64
    # component planes, RGB -> YCbCr (JFIF), floor(x+0.5) rounding
    n = width * height
    if channels == 3:
        planes = [[0] * n, [0] * n, [0] * n]
        import math

        for i in range(n):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            y = math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
            cb = math.floor(
                128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
            )
            cr = math.floor(
                128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5
            )
            planes[0][i] = min(255, max(0, y))
            planes[1][i] = min(255, max(0, cb))
            planes[2][i] = min(255, max(0, cr))
    else:
        planes = [list(pixels)]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: one all-ones 8-bit table, id 0 (zigzag order on the wire)
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(
        quant[_ZIGZAG[i]] for i in range(64)
    )
    # SOF0
    ncomp = channels
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])  # id, 1x1 sampling, qtable 0
    out += b"\xff\xc0" + sof
    # DHT: DC/AC luminance always; chrominance pair for color
    def dht(tc_th, bits, vals):
        return (
            b"\xff\xc4"
            + struct.pack(">H", 19 + len(vals))
            + bytes([tc_th])
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0x00, *_DC_LUM) + dht(0x10, *_AC_LUM)
    if ncomp == 3:
        out += dht(0x01, *_DC_CHROM) + dht(0x11, *_AC_CHROM)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        table = 0x00 if c == 0 else 0x11
        sos += bytes([c + 1, table])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos

    dc_codes = [_huff_codes(*_DC_LUM)] + (
        [_huff_codes(*_DC_CHROM)] * 2 if ncomp == 3 else []
    )
    ac_codes = [_huff_codes(*_AC_LUM)] + (
        [_huff_codes(*_AC_CHROM)] * 2 if ncomp == 3 else []
    )
    bw = _BitWriter()
    pred = [0] * ncomp
    bw_y, bw_x = (height + 7) // 8, (width + 7) // 8
    mcu = 0
    rst = 0
    for by in range(bw_y):
        for bx in range(bw_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.buf
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            mcu += 1
            for c in range(ncomp):
                plane = planes[c]
                block = []
                for yy in range(8):
                    sy = min(by * 8 + yy, height - 1)
                    for xx in range(8):
                        sx = min(bx * 8 + xx, width - 1)
                        block.append(plane[sy * width + sx])
                coef = _fdct_quant(block, quant)
                zz = [coef[_ZIGZAG[i]] for i in range(64)]
                diff = zz[0] - pred[c]
                pred[c] = zz[0]
                size, bits = _mag_bits(diff)
                code, ln = dc_codes[c][size]
                bw.put(code, ln)
                if size:
                    bw.put(bits, size)
                run = 0
                for k in range(1, 64):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[c][0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    size, bits = _mag_bits(zz[k])
                    code, ln = ac_codes[c][(run << 4) | size]
                    bw.put(code, ln)
                    bw.put(bits, size)
                    run = 0
                if run:
                    code, ln = ac_codes[c][0x00]  # EOB
                    bw.put(code, ln)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d, n = self.data, len(self.data)
        while self.nbits <= 24:
            if self.pos >= n:
                raise ValueError("JPEG entropy stream truncated")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < n else None
                if nxt == 0x00:
                    self.pos += 2  # stuffed byte
                else:
                    # marker reached — feed padding; caller stops at
                    # decoded-block count, never past the MCU total
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self):
        """Consume pad bits + RSTn marker at a restart boundary."""
        self.acc = 0
        self.nbits = 0
        d, n = self.data, len(self.data)
        while self.pos + 1 < n and not (
            d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 >= n:
            raise ValueError("JPEG restart marker missing")
        self.pos += 2


def _huff_decode(br: _BitReader, table: dict) -> int:
    """table: (code, length) -> symbol inverted to length buckets."""
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 F.12: map appended bits back to the signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(content: bytes, want_pixels: bool = False) -> dict:
    """Baseline sequential JPEG decoder, stdlib only: marker walk,
    canonical Huffman decode (T.81 F.2), dequant + dezigzag, float
    IDCT with floor(x+0.5) rounding, JFIF YCbCr->RGB. Grayscale and
    4:4:4 color; restart markers honored. Progressive/extended
    (SOF1/SOF2/...), arithmetic coding, 12-bit, and subsampled
    components raise NotImplementedError — documented scope. Every
    truncation/corruption raises ValueError (the parse-error
    contract decode_png also keeps)."""
    import struct

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos, n = 2, len(content)
    quant_tables: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    comps = None
    width = height = None
    restart_interval = 0
    scan_pos = None
    scan_comps = None
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = content[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > n:
            raise ValueError("JPEG segment truncated")
        (seglen,) = struct.unpack_from(">H", content, pos)
        if pos + seglen > n:
            raise ValueError("JPEG segment truncated")
        body = content[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                tab = list(body[o + 1 : o + 65])
                if len(tab) != 64:
                    raise ValueError("DQT truncated")
                dez = [0] * 64
                for i in range(64):
                    dez[_ZIGZAG[i]] = tab[i]
                quant_tables[tq] = dez
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                cnt = sum(bits)
                vals = list(body[o + 17 : o + 17 + cnt])
                if len(bits) != 16 or len(vals) != cnt:
                    raise ValueError("DHT truncated")
                inv = {
                    (code, ln): sym
                    for sym, (code, ln) in _huff_codes(bits, vals).items()
                }
                (dc_tables if tc == 0 else ac_tables)[th] = inv
                o += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            if any(c["h"] != 1 or c["v"] != 1 for c in comps):
                raise NotImplementedError(
                    "chroma-subsampled JPEG not supported (4:4:4 only)"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError("only 1- or 3-component JPEG")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}) "
                "not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append({"cs": cs, "td": tabs >> 4,
                                   "ta": tabs & 0xF})
            scan_pos = pos + seglen
            break
        pos += seglen
    if comps is None or width is None:
        raise ValueError("JPEG missing SOF0")
    if scan_pos is None:
        raise ValueError("JPEG missing SOS")

    by_id = {c["id"]: c for c in comps}
    order = []
    for sc in scan_comps:
        c = by_id.get(sc["cs"])
        if c is None:
            raise ValueError("SOS references unknown component")
        order.append((c, sc))
    ncomp = len(order)
    bw_x, bw_y = (width + 7) // 8, (height + 7) // 8
    planes = [
        [0] * (bw_x * 8 * bw_y * 8) for _ in range(ncomp)
    ]
    br = _BitReader(content, scan_pos)
    pred = [0] * ncomp
    mcu = 0
    for by in range(bw_y):
        for bx in range(bw_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_restart()
                pred = [0] * ncomp
            for ci, (comp, sc) in enumerate(order):
                dct = dc_tables.get(sc["td"])
                act = ac_tables.get(sc["ta"])
                qt = quant_tables.get(comp["tq"])
                if dct is None or act is None or qt is None:
                    raise ValueError("JPEG scan references missing table")
                size = _huff_decode(br, dct)
                diff = _extend(br.bits(size), size) if size else 0
                pred[ci] += diff
                zz = [0] * 64
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    sym = _huff_decode(br, act)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0:
                        if run == 15:
                            k += 16  # ZRL
                            continue
                        raise ValueError("invalid JPEG AC symbol")
                    k += run
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                coef = [0] * 64
                for i in range(64):
                    coef[_ZIGZAG[i]] = zz[i] * qt[_ZIGZAG[i]]
                samples = _idct(coef)
                plane = planes[ci]
                roww = bw_x * 8
                for yy in range(8):
                    dst = (by * 8 + yy) * roww + bx * 8
                    src = yy * 8
                    plane[dst : dst + 8] = samples[src : src + 8]
            mcu += 1
    if b"\xff\xd9" not in content[max(0, br.pos - 2):]:
        raise ValueError("JPEG missing EOI")

    import math

    roww = bw_x * 8
    total = 0
    pixels = bytearray() if want_pixels else None
    if ncomp == 1:
        for y in range(height):
            row = planes[0][y * roww : y * roww + width]
            total += sum(row)
            if want_pixels:
                pixels += bytes(row)
    else:
        yp, cbp, crp = planes
        for y in range(height):
            base = y * roww
            for x in range(width):
                yy = yp[base + x]
                cb = cbp[base + x] - 128
                cr = crp[base + x] - 128
                r = math.floor(yy + 1.402 * cr + 0.5)
                g = math.floor(yy - 0.344136 * cb - 0.714136 * cr + 0.5)
                b = math.floor(yy + 1.772 * cb + 0.5)
                r = 0 if r < 0 else 255 if r > 255 else r
                g = 0 if g < 0 else 255 if g > 255 else g
                b = 0 if b < 0 else 255 if b > 255 else b
                total += r + g + b
                if want_pixels:
                    pixels += bytes((r, g, b))
    out = {
        "img_format": "jpeg", "width": width, "height": height,
        "channels": ncomp, "pixel_sum": total,
    }
    if want_pixels:
        out["pixels"] = bytes(pixels)
    return out


def synth_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic image table: doc_id -> encoded bytes.
    Geometry w = id%8+2, h = id%6+2; logical pixel bytes
    p_i = (7*i + id) % 256 (row-major); format rotates
    ppm/bmp/pgm by id%3. Runs as Arrow-batched mapInPandas — the
    ingestion stand-in producing REAL container bytes that
    decode_images must parse back."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, types = [], [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 8 + 2, d % 6 + 2
                n = (w * h) if d % 3 == 2 else (3 * w * h)
                pix = bytes((7 * i + d) % 256 for i in range(n))
                if d % 3 == 0:
                    blob, mt = encode_ppm(w, h, pix), "image/x-portable-pixmap"
                elif d % 3 == 1:
                    blob, mt = encode_bmp(w, h, pix), "image/bmp"
                else:
                    blob, mt = encode_pgm(w, h, pix), "image/x-portable-graymap"
                ids.append(d)
                blobs.append(blob)
                types.append(mt)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs, "media_type": types}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


def decode_pixels(content: bytes) -> dict:
    """Like :func:`decode_image` but also returns the row-major
    pixel samples — the input contract of the resample stage. PNM
    and PNG rows are already row-major; BMP rows are re-ordered from
    the stored bottom-up BGR layout to top-down RGB."""
    import struct

    if content[:8] == _PNG_SIG:
        return decode_png(content, want_pixels=True)
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(content, want_pixels=True)
    if len(content) >= 26 and content[-26:] == _TGA_FOOTER:
        return decode_tga(content, want_pixels=True)
    if content[:2] in (b"P6", b"P5"):
        meta = decode_image(content)
        w, h, _maxval, off = _parse_pnm_header(content)
        ch = meta["channels"]
        meta["pixels"] = content[off : off + ch * w * h]
        return meta
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(content, want_pixels=True)
    if content[:2] == b"BM":
        meta = decode_image(content)
        data_off = struct.unpack_from("<I", content, 10)[0]
        w, h = meta["width"], meta["height"]
        raw_h = struct.unpack_from("<Iii", content, 14)[2]
        top_down = raw_h < 0
        row_bytes, row_pad = 3 * w, (-3 * w) % 4
        rows = []
        pos = data_off
        for _ in range(h):
            row = content[pos : pos + row_bytes]
            rgb = bytearray()
            for c in range(w):
                rgb += bytes(
                    (row[3 * c + 2], row[3 * c + 1], row[3 * c])
                )
            rows.append(bytes(rgb))
            pos += row_bytes + row_pad
        if not top_down:
            rows.reverse()
        meta["pixels"] = b"".join(rows)
        return meta
    raise NotImplementedError("decode_pixels: unsupported container")


RESIZE_PIXELS_SCHEMA = (
    "doc_id long, img_format string, src_w int, src_h int, "
    "dst_w int, dst_h int, pixel_sum long"
)


def resize_images(df: DataFrame) -> DataFrame:
    """REAL pixel resampling on the multimodal execution shape:
    decode each container's samples (:func:`decode_pixels`), halve
    each side with nearest-neighbor sampling (``src = (dst * src_len)
    // dst_len`` — pure integer arithmetic, so the oracle recomputes
    the resampled checksum exactly from the synthetic pixel formula),
    and emit geometry + the resampled pixel checksum. numpy fancy
    indexing does the gather per image; batches flow through Arrow
    ``mapInPandas`` like every other media stage. ``resize_meta``
    remains the metadata-only planner twin."""
    import numpy as np

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "img_format", "src_w", "src_h", "dst_w",
                "dst_h", "pixel_sum")}
            for did, blob in zip(pdf["doc_id"], pdf["content"]):
                d = decode_pixels(bytes(blob))
                w, h, ch = d["width"], d["height"], d["channels"]
                dw, dh = max(1, w // 2), max(1, h // 2)
                px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(
                    h, w, ch
                )
                sy = (np.arange(dh) * h) // dh
                sx = (np.arange(dw) * w) // dw
                small = px[sy][:, sx]
                out["doc_id"].append(int(did))
                out["img_format"].append(d["img_format"])
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["dst_w"].append(dw)
                out["dst_h"].append(dh)
                out["pixel_sum"].append(int(small.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "img_format": out["img_format"],
                    "src_w": pd.Series(out["src_w"], dtype="int32"),
                    "src_h": pd.Series(out["src_h"], dtype="int32"),
                    "dst_w": pd.Series(out["dst_w"], dtype="int32"),
                    "dst_h": pd.Series(out["dst_h"], dtype="int32"),
                    "pixel_sum": pd.Series(out["pixel_sum"], dtype="int64"),
                }
            )

    return df.mapInPandas(rz, schema=RESIZE_PIXELS_SCHEMA)


def synth_pngs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic PNG table: doc_id -> real PNG bytes.
    Geometry w = id%8+2, h = id%6+2; channels rotate 1/3/4 (gray,
    RGB, RGBA) by id%3; logical samples p_i = (11*i + 3*id) % 256
    row-major; scanline filter for row r is (id + r) % 5, so the
    corpus collectively exercises every PNG filter type against
    every channel layout. Arrow-batched mapInPandas like
    :func:`synth_images`."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 8 + 2, d % 6 + 2
                ch = (1, 3, 4)[d % 3]
                pix = bytes((11 * i + 3 * d) % 256 for i in range(ch * w * h))
                blobs.append(
                    encode_png(w, h, pix, ch,
                               filter_for_row=lambda r, d=d: (d + r) % 5)
                )
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/png"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


def synth_palette_pngs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic PALETTED PNG table: doc_id -> real
    color-type-3 PNG bytes. Geometry w = id%8+2, h = id%6+2; palette
    size P = id%13+3 with entry j = ((7j+3d)%256, (11j+5d)%256,
    (13j+7d)%256); pixel i's index = (5i+d) % P row-major; scanline
    filter for row r = (id+r) % 5 (all five filters exercised against
    the 1-byte-per-pixel indexed layout, whose filter bpp differs
    from every truecolor case). Closed-form by construction, so the
    SQL oracle replays index -> LUT -> sample sum exactly."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 8 + 2, d % 6 + 2
                p = d % 13 + 3
                pal = [
                    ((7 * j + 3 * d) % 256, (11 * j + 5 * d) % 256,
                     (13 * j + 7 * d) % 256)
                    for j in range(p)
                ]
                idx = bytes((5 * i + d) % p for i in range(w * h))
                blobs.append(
                    encode_png_palette(
                        w, h, idx, pal,
                        filter_for_row=lambda r, d=d: (d + r) % 5,
                    )
                )
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/png"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


def synth_interlaced_pngs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic Adam7-INTERLACED PNG table: doc_id ->
    real interlace=1 PNG bytes. Geometry w = id%8+2, h = id%6+2 —
    small enough that several Adam7 passes are EMPTY for most docs,
    so the corpus collectively exercises every empty-pass/partial-
    pass combination; channels rotate 1/3/4 by id%3; logical samples
    p_i = (11*i + 3*id) % 256 row-major (same closed form as
    ``synth_pngs``, so the two corpora differ ONLY in interlacing);
    pass-scanline filters rotate (id + seq) % 5. Arrow-batched
    mapInPandas like every media synth stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 8 + 2, d % 6 + 2
                ch = (1, 3, 4)[d % 3]
                pix = bytes((11 * i + 3 * d) % 256 for i in range(ch * w * h))
                blobs.append(
                    encode_png_interlaced(
                        w, h, pix, ch,
                        filter_for_row=lambda s, d=d: (d + s) % 5,
                    )
                )
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/png"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


DECODE_POSITIONAL_SCHEMA = (
    "doc_id long, img_format string, width int, height int, "
    "channels int, pixel_sum long, pixel_possum long"
)


def decode_images_positional(df: DataFrame) -> DataFrame:
    """Like :func:`decode_images` but adds a POSITION-WEIGHTED sample
    checksum ``pixel_possum = sum((i+1) * p_i)`` over the row-major
    reconstruction. The plain ``pixel_sum`` is order-invariant, so a
    decoder that unfilters correctly but SCATTERS Adam7 pass samples
    to the wrong coordinates would still pass it — the positional
    checksum is exactly what pins the pass-grid reassembly. Same
    Arrow mapInPandas shape as every media stage."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf["content"]:
                r = decode_pixels(bytes(b))
                px = r["pixels"]
                r["pixel_possum"] = sum(
                    (i + 1) * v for i, v in enumerate(px)
                )
                rows.append(r)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "img_format": [r["img_format"] for r in rows],
                    "width": pd.Series([r["width"] for r in rows], dtype="int32"),
                    "height": pd.Series([r["height"] for r in rows], dtype="int32"),
                    "channels": pd.Series([r["channels"] for r in rows], dtype="int32"),
                    "pixel_sum": pd.Series([r["pixel_sum"] for r in rows], dtype="int64"),
                    "pixel_possum": pd.Series(
                        [r["pixel_possum"] for r in rows], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(dec, schema=DECODE_POSITIONAL_SCHEMA)


def synth_gifs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic GIF table: doc_id -> real GIF89a bytes
    (global color table + REAL LZW-compressed image data). Geometry
    w = id%11+2, h = id%7+2; palette size P = id%29+2 with entry
    j = ((5j+7d)%256, (9j+11d)%256, (3j+13d)%256); pixel i's index =
    (i*i + d) % P row-major (quadratic stride so runs, repeats, and
    fresh strings all occur and the LZW dictionary genuinely grows).
    Closed-form by construction — the SQL oracle replays
    index -> palette -> sample sum without touching the codec."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 11 + 2, d % 7 + 2
                p = d % 29 + 2
                pal = [
                    ((5 * j + 7 * d) % 256, (9 * j + 11 * d) % 256,
                     (3 * j + 13 * d) % 256)
                    for j in range(p)
                ]
                idx = bytes((i * i + d) % p for i in range(w * h))
                blobs.append(encode_gif(w, h, idx, pal))
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/gif"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


def synth_interlaced_gifs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic INTERLACED GIF table (r10): same geometry /
    palette / index formulas as :func:`synth_gifs` (so the oracle's
    closed form is unchanged), but every image stores its rows in the
    4-pass interlace order, and ODD doc_ids move the color table into
    the image descriptor (LOCAL table) behind a reversed DECOY global
    table — a decoder that skips deinterlacing fails the positional
    checksum, and one that reads the global table fails both sums."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 11 + 2, d % 7 + 2
                p = d % 29 + 2
                pal = [
                    ((5 * j + 7 * d) % 256, (9 * j + 11 * d) % 256,
                     (3 * j + 13 * d) % 256)
                    for j in range(p)
                ]
                idx = bytes((i * i + d) % p for i in range(w * h))
                blobs.append(
                    encode_gif(w, h, idx, pal, interlaced=True,
                               local_palette=bool(d % 2))
                )
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/gif"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


def synth_jpegs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic JPEG table: doc_id -> real baseline
    JPEG bytes (SOI/DQT/SOF0/DHT/[DRI]/SOS + Annex-K Huffman
    entropy data). Geometry w = 8*(id%3+1), h = 8*(id%2+1); gray
    when id%3 == 0 else YCbCr color; restart interval rotates id%3
    (0 = none). Every 8x8 block is CONSTANT — per block b
    (row-major): gray v = (7*id+13*b)%256, color
    (r,g,b) = ((7*id+13*b)%256, (11*id+17*b)%256, (5*id+19*b)%256).
    Constant blocks have a DC-only DCT, which the all-ones quant
    table carries exactly, so the decode is bit-exact and the SQL
    oracle can replay the whole codec chain (RGB->YCbCr rounding,
    DC round trip, YCbCr->RGB rounding) in closed form."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 * (d % 3 + 1), 8 * (d % 2 + 1)
                ch = 1 if d % 3 == 0 else 3
                bw_x = w // 8
                pix = bytearray()
                for y in range(h):
                    for x in range(w):
                        b = (y // 8) * bw_x + (x // 8)
                        if ch == 1:
                            pix.append((7 * d + 13 * b) % 256)
                        else:
                            pix += bytes((
                                (7 * d + 13 * b) % 256,
                                (11 * d + 17 * b) % 256,
                                (5 * d + 19 * b) % 256,
                            ))
                blobs.append(
                    encode_jpeg(w, h, bytes(pix), ch,
                                restart_interval=d % 3)
                )
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/jpeg"] * len(ids)}
            )

    # _spread: JPEG is the one synth whose per-row Python encode is
    # expensive enough (~0.8 ms/row: per-block FDCT + Huffman bit-
    # writing) to repay a row shuffle; the cheap generators measured
    # net-negative under the same treatment and stay scan-partitioned.
    return _spread(df.select(id_col)).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


DECODE_SCHEMA = (
    "doc_id long, img_format string, width int, height int, "
    "channels int, pixel_sum long"
)


def decode_images(df: DataFrame) -> DataFrame:
    """Decode a binary image column through the standard multimodal
    execution shape (Arrow-batched mapInPandas, one worker per
    partition, blobs never leave the executor). Real parsing — the
    geometry and checksum come from the container bytes, not from
    metadata riding alongside."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_image(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "img_format": [r["img_format"] for r in rows],
                    "width": pd.Series([r["width"] for r in rows], dtype="int32"),
                    "height": pd.Series([r["height"] for r in rows], dtype="int32"),
                    "channels": pd.Series([r["channels"] for r in rows], dtype="int32"),
                    "pixel_sum": pd.Series([r["pixel_sum"] for r in rows], dtype="int64"),
                }
            )

    return df.mapInPandas(dec, schema=DECODE_SCHEMA)


def fake_decode_meta(df: DataFrame) -> DataFrame:
    """Deterministic 'decode': derive pseudo width/height from the
    content bytes via mapInPandas (Arrow-batched, partition-parallel).

    This is the exact execution shape a real decoder uses — swap the
    body for PIL/ffmpeg calls and the plan is unchanged.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": lens.astype("int32"),
                    "sha256": pdf["sha256"],
                    "fake_width": (lens % 640 + 1).astype("int32"),
                    "fake_height": (lens % 480 + 1).astype("int32"),
                }
            )

    return df.mapInPandas(decode_batches, schema=MEDIA_META_SCHEMA)


def target_partitions(df: DataFrame, total_bytes: int, bytes_per_partition: int = 128 << 20) -> DataFrame:
    """Repartition a blob table by payload size, not row count."""
    n = max(1, total_bytes // bytes_per_partition)
    return df.repartition(int(n))


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms long, byte_offset long"


def frame_sample(df: DataFrame, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled
    frame (1-to-N mapInPandas — the shape ffmpeg keyframe extraction
    uses). Frame *positions* are deterministic arithmetic on the blob
    (n = min(max_frames, byte_len // 200 + 1), evenly spaced byte
    offsets, 1 s apart), so the plumbing is exactly oracle-checkable;
    a real build swaps the arithmetic for container parsing and the
    plan is unchanged."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, offs = [], [], [], []
            for doc_id, blen in zip(pdf["doc_id"], pdf["byte_len"]):
                n = min(max_frames, int(blen) // 200 + 1)
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * 1000)
                    offs.append(i * int(blen) // n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                }
            )

    return df.mapInPandas(sample_batches, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, src_width int, src_height int, dst_width int, dst_height int"
)


def resize_meta(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize geometry over the fake-decoded
    dimensions (vectorized pandas arithmetic in mapInPandas; the real
    pixel resample is the codec stub — geometry is the verifiable
    Spark-side part)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["fake_width"].astype("int64")
            h = pdf["fake_height"].astype("int64")
            side = w.combine(h, max)
            scaled = side > max_side
            dw = w.where(~scaled, (w * max_side) // side)
            dh = h.where(~scaled, (h * max_side) // side)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_width": w.astype("int32"),
                    "src_height": h.astype("int32"),
                    "dst_width": dw.astype("int32"),
                    "dst_height": dh.astype("int32"),
                }
            )

    return df.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


EMBED_DIM = 8
EMBED_SCHEMA = f"doc_id long, embedding array<double>"


def fake_feature_extract(df: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Feature-extraction plumbing: content -> fixed-dim vector via
    mapInPandas (the signature a vision/audio encoder batch-inference
    UDF has). Features are deterministic slices of the sha256 hex
    (4 hex chars per dimension, scaled to [0, 1]) so the DuckDB
    oracle reproduces them exactly; a real build swaps in model
    inference over the Arrow batch."""

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [
                [int(h[4 * j : 4 * j + 4], 16) / 65535.0 for j in range(dim)]
                for h in pdf["sha256"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})

    return df.mapInPandas(embed_batches, schema=EMBED_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: RIFF/WAVE PCM — the audio modality's decode_image counterpart.
# Pure-Python codec (no audio libs in this container); compressed
# codecs (mp3/ogg/aac) remain a declared seam exactly like JPEG/PNG.
# ---------------------------------------------------------------------------

def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Canonical 16-bit mono PCM WAV: RIFF header + fmt + data chunks."""
    import struct

    body = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def decode_wav(content: bytes, want_samples: bool = False) -> dict:
    """Decode PCM WAV by WALKING the RIFF chunk list (fmt/data may sit
    in any order with vendor chunks between them — real files do
    this). Returns rate/channels/bits/sample count plus the sum of
    absolute sample values (an order-invariant content checksum the
    oracle recomputes); ``want_samples`` adds the decoded int16
    samples (for the feature-extraction stage). Non-PCM formats
    raise NotImplementedError — the compressed-codec seam."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, n = 12, len(content)
    fmt = data = None
    while pos + 8 <= n:
        cid = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        chunk = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, rate, _, block_align, bits = fmt
    if audio_format == 7 and bits == 8:
        # ITU-T G.711 mu-law: canonical integer expansion (CCITT
        # reference ulaw2linear) — one byte per sample to 14-bit
        # linear. Pure integer arithmetic, so the SQL oracle replays
        # it closed-form.
        samples = tuple(_mulaw_expand(b) for b in data)
        return _wav_out(rate, channels, bits, samples, want_samples)
    if audio_format == 0x11 and bits == 4:
        if channels != 1:
            # Stereo IMA ADPCM interleaves per-channel block headers
            # and 4-sample nibble groups — a different block layout
            # than the mono path below would silently mis-decode.
            raise NotImplementedError(
                f"multi-channel ({channels}) IMA ADPCM WAV — "
                "interleaved-block seam; only mono is supported"
            )
        # IMA/DVI ADPCM (WAV format tag 0x11): block-structured —
        # each block opens with a 4-byte header (int16 predictor,
        # uint8 step index, reserved) whose predictor IS the first
        # output sample, then 4-bit codes two-per-byte, LOW nibble
        # first, each advancing the (predictor, index) state machine.
        # Pure integer arithmetic end to end, so the SQL oracle can
        # replay the exact recurrence with a recursive CTE.
        samples = []
        for off in range(0, len(data), block_align):
            block = data[off : off + block_align]
            if len(block) < 4:
                break
            samples.extend(_adpcm_decode_block(block))
        return _wav_out(rate, channels, bits, samples, want_samples)
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"non-PCM16 WAV (format={audio_format}, bits={bits}) needs a "
            "real audio codec — not available in this environment"
        )
    count = len(data) // 2
    samples = struct.unpack(f"<{count}h", data[: 2 * count])
    return _wav_out(rate, channels, bits, samples, want_samples)


def _mulaw_expand(u: int) -> int:
    """G.711 mu-law byte -> linear sample (the CCITT ulaw2linear
    reference: bias 0x84, 3-bit segment shift)."""
    u = ~u & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


# IMA/DVI ADPCM reference tables (IMA Digital Audio Focus and
# Technical Working Groups recommendation, 1992 — the public spec
# every .wav format-0x11 reader implements)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def _adpcm_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM state transition: 4-bit code -> next
    (predictor, step index). The canonical shift-add difference
    expansion — diff = step/8 + (b0?step/4) + (b1?step/2) +
    (b2?step), sign from b3 — all integer, clamped to int16/[0,88]."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib]))
    return pred, idx


def _adpcm_decode_block(block: bytes) -> list[int]:
    """Decode one IMA ADPCM block: header sample + one sample per
    nibble (low nibble of each byte first)."""
    import struct

    pred = struct.unpack("<h", block[0:2])[0]
    idx = min(88, block[2])
    out = [pred]
    for byte in block[4:]:
        for nib in (byte & 0x0F, byte >> 4):
            pred, idx = _adpcm_step(pred, idx, nib)
            out.append(pred)
    return out


def encode_wav_adpcm(
    sample_rate: int, predictor: int, index: int, nibbles: list[int]
) -> bytes:
    """Mono IMA ADPCM WAV (format tag 0x11): 20-byte fmt chunk with
    the wSamplesPerBlock extension, a fact chunk carrying the
    decoded sample count, and ONE data block (header + packed
    nibbles, low nibble first). ``len(nibbles)`` must be even so the
    block carries no padding codes."""
    import struct

    if len(nibbles) % 2:
        raise ValueError("nibble count must be even (two codes per byte)")
    body = struct.pack("<hBB", predictor, index, 0) + bytes(
        (nibbles[i] & 0x0F) | ((nibbles[i + 1] & 0x0F) << 4)
        for i in range(0, len(nibbles), 2)
    )
    n_samples = len(nibbles) + 1
    block_align = len(body)
    byte_rate = (sample_rate * block_align + n_samples - 1) // n_samples
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4,
        2, n_samples,
    )
    fact = struct.pack("<I", n_samples)
    payload = (
        b"fmt " + struct.pack("<I", 20) + fmt
        + b"fact" + struct.pack("<I", 4) + fact
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload


def synth_adpcm_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic IMA ADPCM WAV table: doc_id ->
    format-0x11 container bytes. predictor = ((37*id) % 4001) - 2000;
    step index = id % 89 (every table entry is some doc's starting
    step); n = 2*(id%24 + 8) nibbles (16..62, even);
    nibble_i = (7*i + id) % 16 — all sixteen codes occur, so sign
    bit, every magnitude bit, and both clamp directions are
    exercised across the corpus."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                pred = ((37 * d) % 4001) - 2000
                idx = d % 89
                count = 2 * (d % 24 + 8)
                nibs = [(7 * i + d) % 16 for i in range(count)]
                ids.append(d)
                blobs.append(encode_wav_adpcm(8000, pred, idx, nibs))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "content": blobs}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary"
    )


def _wav_out(rate, channels, bits, samples, want_samples) -> dict:
    out = {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_samples": len(samples) // channels,
        "abs_sum": sum(abs(s) for s in samples),
    }
    if want_samples:
        out["samples"] = list(samples)
    return out


def encode_wav_mulaw(sample_rate: int, mulaw_bytes: bytes) -> bytes:
    """Mono G.711 mu-law WAV (format code 7, 8 bits/sample)."""
    import struct

    fmt = struct.pack(
        "<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(mulaw_bytes)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(mulaw_bytes)) + mulaw_bytes
    )


def synth_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic WAV table: doc_id -> PCM16 container
    bytes. rate = 8000 + (id%4)*4000; n = id%50 + 10 samples;
    sample_i = ((31*i + id) % 4001) - 2000. Arrow-batched
    mapInPandas, same shape as synth_images."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                rate = 8000 + (d % 4) * 4000
                count = d % 50 + 10
                samples = [((31 * i + d) % 4001) - 2000 for i in range(count)]
                ids.append(d)
                blobs.append(encode_wav(rate, samples))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "content": blobs}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary"
    )


def synth_mulaw_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic mu-law WAV table: doc_id -> format-7
    container bytes. rate = 8000; n = id%60 + 20 mu-law bytes;
    byte_i = (7*i + id) % 256 — every segment/sign/mantissa
    combination occurs across the corpus, so the expansion formula
    is exercised end to end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                count = d % 60 + 20
                raw = bytes((7 * i + d) % 256 for i in range(count))
                ids.append(d)
                blobs.append(encode_wav_mulaw(8000, raw))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "content": blobs}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary"
    )


AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, channels int, bits int, "
    "n_samples long, abs_sum long"
)


def decode_audios(df: DataFrame) -> DataFrame:
    """Decode a binary WAV column on the standard Arrow-batched
    mapInPandas shape — geometry and checksum come from the container
    bytes, not metadata riding alongside."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_wav(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "sample_rate": pd.Series([r["sample_rate"] for r in rows], dtype="int32"),
                    "channels": pd.Series([r["channels"] for r in rows], dtype="int32"),
                    "bits": pd.Series([r["bits"] for r in rows], dtype="int32"),
                    "n_samples": pd.Series([r["n_samples"] for r in rows], dtype="int64"),
                    "abs_sum": pd.Series([r["abs_sum"] for r in rows], dtype="int64"),
                }
            )

    return df.mapInPandas(dec, schema=AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Video: uncompressed AVI (RIFF + raw bottom-up DIB frames) — the video
# modality's real decoder. Same pure-Python story as images/audio;
# compressed codecs (h264/vp9/av1) remain the declared seam.
# ---------------------------------------------------------------------------

def _dib_rows(width: int, height: int, rgb: bytes) -> bytes:
    """Row-major RGB -> bottom-up BGR rows padded to 4 bytes (the DIB
    layout BMP and AVI '00db' frames share)."""
    row_pad = (-3 * width) % 4
    body = bytearray()
    for r in range(height - 1, -1, -1):
        row = rgb[3 * width * r : 3 * width * (r + 1)]
        for c in range(width):
            body += bytes((row[3 * c + 2], row[3 * c + 1], row[3 * c]))
        body += b"\x00" * row_pad
    return bytes(body)


def _undib_rows(width: int, height: int, dib: bytes) -> bytes:
    """Inverse of _dib_rows: bottom-up padded BGR -> row-major RGB."""
    stride = 3 * width + ((-3 * width) % 4)
    out = bytearray()
    for r in range(height - 1, -1, -1):
        row = dib[stride * r : stride * r + 3 * width]
        for c in range(width):
            out += bytes((row[3 * c + 2], row[3 * c + 1], row[3 * c]))
    return bytes(out)


def _chunk(cid: bytes, body: bytes) -> bytes:
    import struct

    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list_chunk(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(width: int, height: int, frames: list[bytes], fps: int = 10) -> bytes:
    """Minimal spec-true uncompressed AVI: hdrl (avih + one 'vids'/DIB
    stream) then movi with one '00db' DIB frame chunk per frame."""
    import struct

    if any(len(f) != 3 * width * height for f in frames):
        raise ValueError("each frame needs 3*w*h RGB bytes")
    frame_size = len(_dib_rows(width, height, frames[0])) if frames else 0
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10, len(frames), 0, 1,
        frame_size, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        frame_size, 0, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = _list_chunk(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list_chunk(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list_chunk(
        b"movi",
        b"".join(_chunk(b"00db", _dib_rows(width, height, f)) for f in frames),
    )
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi(content: bytes, want_frames: bool = False) -> dict:
    """Decode an uncompressed AVI by walking the RIFF tree: avih gives
    geometry/frame count, strf must declare 24-bit BI_RGB (anything
    else raises the compressed-codec seam), and every movi '00db'
    frame is un-DIB'd back to RGB. Returns geometry, frame count, and
    the pixel-byte sum across all frames (order-invariant checksum);
    ``want_frames`` adds the decoded row-major RGB frames (for the
    motion-profile stage).
    """
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")

    width = height = declared_frames = None
    compression = bit_count = None
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, declared_frames, compression, bit_count
        pos, n = 0, len(buf)
        while pos + 8 <= n:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + size]
            if cid == b"LIST":
                walk(body[4:])  # skip the list kind, walk its children
            elif cid == b"avih":
                vals = struct.unpack("<IIIIIIIIII", body[:40])
                declared_frames, width, height = vals[4], vals[8], vals[9]
            elif cid == b"strf":
                hdr = struct.unpack("<IiiHHI", body[:20])
                bit_count, compression = hdr[4], hdr[5]
            elif cid == b"00db":
                frames.append(body)
            pos += 8 + size + (size & 1)

    walk(content[12:])
    if width is None or compression is None:
        raise ValueError("missing avih or strf header")
    if compression != 0 or bit_count != 24:
        raise NotImplementedError(
            f"compressed AVI (biCompression={compression}, bits={bit_count}) "
            "needs a real video codec — not available in this environment"
        )
    rgb_frames = [_undib_rows(width, height, f) for f in frames]
    pixel_sum = sum(sum(f) for f in rgb_frames)
    if declared_frames != len(frames):
        raise ValueError(
            f"header declares {declared_frames} frames, movi has {len(frames)}"
        )
    out = {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "pixel_sum": pixel_sum,
    }
    if want_frames:
        out["frames"] = rgb_frames
    return out


def synth_videos(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic AVI table: w = id%6+2, h = id%4+2,
    n_frames = id%5+1, frame f pixel byte i = (11*i + 13*f + id) % 256
    (row-major RGB). Arrow-batched mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h, nf = d % 6 + 2, d % 4 + 2, d % 5 + 1
                frames = [
                    bytes((11 * i + 13 * f + d) % 256 for i in range(3 * w * h))
                    for f in range(nf)
                ]
                ids.append(d)
                blobs.append(encode_avi(w, h, frames))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "content": blobs}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary"
    )


AUDIO_FRAME_SCHEMA = (
    "doc_id long, frame_id int, n_samples int, sum_sq long, peak int, "
    "zero_crossings int, rms_micro long"
)


def audio_frame_features(df: DataFrame, frame_size: int = 16) -> DataFrame:
    """Audio feature extraction over REAL decoded PCM: per
    ``frame_size``-sample frame, energy (exact integer sum of
    squares), peak amplitude, zero-crossing count (strict sign
    flips), and RMS quantized to integer micro-units via
    ``floor(x*1e6 + 0.5)`` — never a language-level round, so the
    SQL oracle replays the one float op (sqrt) exactly. The classic
    VAD/segmentation feature set, all integer-exact but the RMS.

    Same Arrow mapInPandas shape as every media stage; a real
    pipeline swaps the feature body for an encoder model, the
    decode + framing plumbing is unchanged."""
    import math

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_id", "n_samples", "sum_sq", "peak",
                "zero_crossings", "rms_micro")}
            for did, blob in zip(pdf["doc_id"], pdf["content"]):
                d = decode_wav(bytes(blob), want_samples=True)
                s = d["samples"]
                for f0 in range(0, len(s), frame_size):
                    fr = s[f0 : f0 + frame_size]
                    sum_sq = sum(v * v for v in fr)
                    zc = sum(
                        1
                        for a, b in zip(fr, fr[1:])
                        if (a < 0 < b) or (a > 0 > b)
                    )
                    out["doc_id"].append(int(did))
                    out["frame_id"].append(f0 // frame_size)
                    out["n_samples"].append(len(fr))
                    out["sum_sq"].append(sum_sq)
                    out["peak"].append(max(abs(v) for v in fr))
                    out["zero_crossings"].append(zc)
                    out["rms_micro"].append(
                        math.floor(
                            math.sqrt(sum_sq / len(fr)) * 1e6 + 0.5
                        )
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_id": pd.Series(out["frame_id"], dtype="int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int32"),
                    "sum_sq": pd.Series(out["sum_sq"], dtype="int64"),
                    "peak": pd.Series(out["peak"], dtype="int32"),
                    "zero_crossings": pd.Series(
                        out["zero_crossings"], dtype="int32"
                    ),
                    "rms_micro": pd.Series(out["rms_micro"], dtype="int64"),
                }
            )

    return df.mapInPandas(feats, schema=AUDIO_FRAME_SCHEMA)


VIDEO_SCHEMA = "doc_id long, width int, height int, n_frames int, pixel_sum long"


MOTION_SCHEMA = (
    "doc_id long, frame_id int, n_px long, motion_sum long, "
    "motion_max int"
)


def video_motion_profile(df: DataFrame) -> DataFrame:
    """Per-frame-pair motion metric over REAL decoded AVI frames:
    for each consecutive (f-1, f) pair, the sum and max of absolute
    per-byte differences of the row-major RGB samples — the standard
    cheap shot/scene-change signal (all integer arithmetic, so the
    oracle replays it exactly from the generator formula). Videos
    with a single frame emit no rows. Arrow mapInPandas,
    partition-parallel, frames never leave the executor."""

    def motion(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_id", "n_px", "motion_sum", "motion_max")}
            for did, blob in zip(pdf["doc_id"], pdf["content"]):
                d = decode_avi(bytes(blob), want_frames=True)
                frames = d["frames"]
                for f in range(1, len(frames)):
                    prev, cur = frames[f - 1], frames[f]
                    diffs = [abs(a - b) for a, b in zip(cur, prev)]
                    out["doc_id"].append(int(did))
                    out["frame_id"].append(f)
                    out["n_px"].append(len(diffs))
                    out["motion_sum"].append(sum(diffs))
                    out["motion_max"].append(max(diffs) if diffs else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_id": pd.Series(out["frame_id"], dtype="int32"),
                    "n_px": pd.Series(out["n_px"], dtype="int64"),
                    "motion_sum": pd.Series(out["motion_sum"], dtype="int64"),
                    "motion_max": pd.Series(out["motion_max"], dtype="int32"),
                }
            )

    return df.mapInPandas(motion, schema=MOTION_SCHEMA)


def decode_videos(df: DataFrame) -> DataFrame:
    """Decode a binary AVI column on the Arrow-batched mapInPandas
    shape — geometry, frame count, and checksum come from the
    container bytes."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_avi(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([r["width"] for r in rows], dtype="int32"),
                    "height": pd.Series([r["height"] for r in rows], dtype="int32"),
                    "n_frames": pd.Series([r["n_frames"] for r in rows], dtype="int32"),
                    "pixel_sum": pd.Series([r["pixel_sum"] for r in rows], dtype="int64"),
                }
            )

    return df.mapInPandas(dec, schema=VIDEO_SCHEMA)


CHANNEL_STATS_SCHEMA = (
    "doc_id long, channel int, n_samples long, sample_sum long, "
    "sample_min int, sample_max int"
)


def image_channel_stats(df: DataFrame) -> DataFrame:
    """Per-channel sample statistics over REAL decoded pixels: for
    each image and channel, the count / sum / min / max of that
    channel\'s samples (row-major interleaved layout: sample i
    belongs to channel i mod C) — the normalization-statistics pass
    every vision-training pipeline runs before standardizing inputs.
    Integer-exact outputs; Arrow mapInPandas like every media stage,
    numpy strided views doing the per-channel gather."""
    import numpy as np

    def st(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "channel", "n_samples", "sample_sum",
                "sample_min", "sample_max")}
            for did, blob in zip(pdf["doc_id"], pdf["content"]):
                d = decode_pixels(bytes(blob))
                ch = d["channels"]
                px = np.frombuffer(d["pixels"], dtype=np.uint8)
                for c in range(ch):
                    v = px[c::ch]
                    out["doc_id"].append(int(did))
                    out["channel"].append(c)
                    out["n_samples"].append(int(v.size))
                    out["sample_sum"].append(int(v.sum(dtype=np.int64)))
                    out["sample_min"].append(int(v.min()))
                    out["sample_max"].append(int(v.max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "channel": pd.Series(out["channel"], dtype="int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "sample_sum": pd.Series(out["sample_sum"], dtype="int64"),
                    "sample_min": pd.Series(out["sample_min"], dtype="int32"),
                    "sample_max": pd.Series(out["sample_max"], dtype="int32"),
                }
            )

    return df.mapInPandas(st, schema=CHANNEL_STATS_SCHEMA)


def synth_png16s(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic 16-BIT PNG table: doc_id -> real
    depth-16 PNG bytes. Geometry w = id%8+2, h = id%6+2; channels
    rotate 1/2/3/4 by id%4 (gray, GRAY+ALPHA, RGB, RGBA — every
    legal non-indexed color type); every second doc is
    Adam7-interlaced (id%2), so the corpus exercises 16-bit against
    both layouts;
    samples s_i = (25309*i + 77*id) % 65536 row-major (values far
    above 255 prove true 16-bit decode — an 8-bit-truncating decoder
    cannot reproduce the sum); pass/row filters rotate (id+seq) % 5.
    Arrow mapInPandas like every media synth stage."""
    import struct

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 8 + 2, d % 6 + 2
                ch = (1, 2, 3, 4)[d % 4]
                vals = [
                    (25309 * i + 77 * d) % 65536
                    for i in range(ch * w * h)
                ]
                if d % 2:
                    blob = encode_png_interlaced(
                        w, h, struct.pack(f">{len(vals)}H", *vals), ch,
                        filter_for_row=lambda s, d=d: (d + s) % 5,
                        depth=16,
                    )
                else:
                    blob = encode_png16(
                        w, h, vals, ch,
                        filter_for_row=lambda r, d=d: (d + r) % 5,
                    )
                blobs.append(blob)
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/png"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


DECODE_DEPTH_SCHEMA = (
    "doc_id long, img_format string, width int, height int, "
    "channels int, bit_depth int, pixel_sum long"
)


def decode_pngs_with_depth(df: DataFrame) -> DataFrame:
    """:func:`decode_images` variant surfacing ``bit_depth`` — the
    column that proves a depth-16 stream decoded through the 16-bit
    sample path rather than silently truncating. PNG-only input
    (the other containers carry no depth field)."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_png(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "img_format": [r["img_format"] for r in rows],
                    "width": pd.Series([r["width"] for r in rows], dtype="int32"),
                    "height": pd.Series([r["height"] for r in rows], dtype="int32"),
                    "channels": pd.Series([r["channels"] for r in rows], dtype="int32"),
                    "bit_depth": pd.Series([r["bit_depth"] for r in rows], dtype="int32"),
                    "pixel_sum": pd.Series([r["pixel_sum"] for r in rows], dtype="int64"),
                }
            )

    return df.mapInPandas(dec, schema=DECODE_DEPTH_SCHEMA)


def synth_sub8_pngs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic SUB-8-BIT / tRNS paletted PNG table:
    depth rotates 1/2/4/8 by id%4 (sub-8 scanlines pack MSB-first);
    every second doc is Adam7-interlaced; every third carries a tRNS
    chunk (alpha[j] = (17j+9id)%256 over the first (id%P)+1 entries,
    decoding to RGBA). Geometry w = id%8+2, h = id%6+2; palette size
    P = min(id%13+3, 2^depth) with the synth_palette_pngs entry
    formulas; pixel i's index = (5i+id) % P. Closed-form, so the SQL
    oracle replays index -> LUT (+alpha) -> sample sum exactly."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 8 + 2, d % 6 + 2
                depth = (1, 2, 4, 8)[d % 4]
                p = min(d % 13 + 3, 1 << depth)
                pal = [
                    ((7 * j + 3 * d) % 256, (11 * j + 5 * d) % 256,
                     (13 * j + 7 * d) % 256)
                    for j in range(p)
                ]
                idx = bytes((5 * i + d) % p for i in range(w * h))
                trans = (
                    [(17 * j + 9 * d) % 256 for j in range((d % p) + 1)]
                    if d % 3 == 0 else None
                )
                if d % 2:
                    blob = encode_png_interlaced(
                        w, h, idx, 1, palette=pal, depth=depth,
                        trans=trans,
                        filter_for_row=lambda s, d=d: (d + s) % 5,
                    )
                else:
                    blob = encode_png_palette(
                        w, h, idx, pal, depth=depth, trans=trans,
                        filter_for_row=lambda r, d=d: (d + r) % 5,
                    )
                blobs.append(blob)
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/png"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


# ---------------------------------------------------------------------------
# QOI — the "Quite OK Image" format (r10), a real stdlib-only codec.
#
# Scope: the complete public spec (qoiformat.org/qoi-specification.pdf,
# one page): 3- or 4-channel 8-bit images, all six op families
# (RGB / RGBA / INDEX / DIFF / LUMA / RUN), the 64-entry running
# color index with the (3r+5g+7b+11a) % 64 hash, and the 8-byte end
# marker. QOI is a natural fit for a training-data lake: single-pass
# O(n) encode/decode with zero dependencies, commonly used as the
# cheap intermediate for image-pipeline shuffles.
#
# Reference parity: the reference pipeline treats media as opaque
# blobs (scripts/bronze-silver.py carries no media ops); this codec
# exists for the LLM-curation extension surface on the Arrow
# mapInPandas shape, same rationale as decode_png / decode_jpeg.
# ---------------------------------------------------------------------------

_QOI_MAGIC = b"qoif"
_QOI_END = b"\x00" * 7 + b"\x01"


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Reference QOI encoder: greedy RUN > INDEX > DIFF > LUMA >
    RGB/RGBA op selection, exactly the spec's decode inverse.
    ``pixels`` is row-major RGB or RGBA bytes (len = w*h*channels)."""
    import struct

    if channels not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match geometry")
    out = bytearray(_QOI_MAGIC)
    out += struct.pack(">IIBB", width, height, channels, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(width * height):
        o = i * channels
        r, g, b = pixels[o], pixels[o + 1], pixels[o + 2]
        a = pixels[o + 3] if channels == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:  # max encodable run (63/64 collide with RGB tags)
                out.append(0xC0 | (run - 1))
                run = 0
        else:
            if run:
                out.append(0xC0 | (run - 1))
                run = 0
            h = _qoi_hash(r, g, b, a)
            if index[h] == (r, g, b, a):
                out.append(h)  # QOI_OP_INDEX (top bits 00)
            else:
                index[h] = (r, g, b, a)
                if a == pa:
                    dr = (r - pr + 128) % 256 - 128
                    dg = (g - pg + 128) % 256 - 128
                    db = (b - pb + 128) % 256 - 128
                    if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                        out.append(
                            0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                        )
                    elif (
                        -32 <= dg <= 31
                        and -8 <= dr - dg <= 7
                        and -8 <= db - dg <= 7
                    ):
                        out.append(0x80 | (dg + 32))
                        out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                    else:
                        out.append(0xFE)
                        out += bytes((r, g, b))
                else:
                    out.append(0xFF)
                    out += bytes((r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _QOI_END
    return bytes(out)


def decode_qoi(content: bytes, want_pixels: bool = False) -> dict:
    """QOI decoder (full spec): walks the op stream reconstructing
    the running pixel, 64-entry index, and runs; validates the pixel
    count and the 8-byte end marker (truncation raises, never
    returns a short image). Emits the standard decode row — format,
    geometry, channels, order-invariant pixel_sum — plus raw pixels
    when asked."""
    import struct

    if content[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI stream (bad magic)")
    if len(content) < 14 + len(_QOI_END):
        raise ValueError("truncated QOI stream (no room for header + end)")
    width, height, channels, colorspace = struct.unpack_from(
        ">IIBB", content, 4
    )
    if channels not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"QOI colorspace must be 0 or 1, got {colorspace}")
    n_px = width * height
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(content) - len(_QOI_END)
    if content[end:] != _QOI_END:
        raise ValueError("QOI stream missing end marker")
    out = bytearray() if want_pixels else None
    total = 0
    seen = 0
    while seen < n_px:
        if pos >= end:
            raise ValueError("truncated QOI stream (ops ended early)")
        b1 = content[pos]
        pos += 1
        run = 1
        if b1 == 0xFE:  # QOI_OP_RGB
            r, g, b = content[pos], content[pos + 1], content[pos + 2]
            pos += 3
            index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        elif b1 == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = (
                content[pos], content[pos + 1],
                content[pos + 2], content[pos + 3],
            )
            pos += 4
            index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        elif b1 >> 6 == 0:  # QOI_OP_INDEX
            r, g, b, a = index[b1]
        elif b1 >> 6 == 1:  # QOI_OP_DIFF
            r = (r + ((b1 >> 4) & 3) - 2) % 256
            g = (g + ((b1 >> 2) & 3) - 2) % 256
            b = (b + (b1 & 3) - 2) % 256
            index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        elif b1 >> 6 == 2:  # QOI_OP_LUMA
            b2 = content[pos]
            pos += 1
            dg = (b1 & 0x3F) - 32
            r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (b2 & 0xF) - 8) % 256
            index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        else:  # QOI_OP_RUN
            run = (b1 & 0x3F) + 1
        if seen + run > n_px:
            raise ValueError("QOI run overflows the pixel count")
        px = (r, g, b) if channels == 3 else (r, g, b, a)
        total += sum(px) * run
        if want_pixels:
            out += bytes(px) * run
        seen += run
    if pos != end:
        raise ValueError("QOI stream has trailing ops past the pixel count")
    res = {
        "img_format": "qoi",
        "width": int(width), "height": int(height),
        "channels": int(channels), "pixel_sum": int(total),
    }
    if want_pixels:
        res["pixels"] = bytes(out)
    return res


def synth_qois(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic QOI table: doc_id -> real QOI bytes.
    Geometry w = d%9+2, h = d%5+2; channels = 4 when d%3 == 0 else 3.
    Pixels are closed-form (the SQL oracle replays them without
    touching the codec) but SHAPED to drive every op family through
    the encoder: with seg = i//8, phi = i%8, and seg_eff = 0 when
    seg%3 == 2 (color recurrence -> INDEX hits) else seg:

      r = (7d + 211*seg_eff + [0,0,0,6,6,6,3,1][phi]) % 256
      g = (11d + 197*seg_eff + [0,0,0,5,5,5,2,1][phi]) % 256
      b = (13d + 181*seg_eff + [0,0,0,3,3,3,1,1][phi]) % 256
      a = (5d + 23*(i//11)) % 256           (4-channel docs only)

    phi 1-2 and 4-5 repeat the previous pixel (RUN); phi 3 steps
    {+6,+5,+3} (LUMA: dg=5, dr-dg=1, db-dg=-2); phi 6 steps
    {-3,-3,-2} (LUMA again); phi 7 steps {-2,-1,0} (DIFF); segment
    boundaries jump by the large odd strides (RGB / INDEX on
    recurrence); alpha steps every 11 pixels force RGBA ops.
    test_qoi_fixture_covers_all_ops asserts all six op families
    actually occur across the fixture."""
    r_off = [0, 0, 0, 6, 6, 6, 3, 1]
    g_off = [0, 0, 0, 5, 5, 5, 2, 1]
    b_off = [0, 0, 0, 3, 3, 3, 1, 1]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 9 + 2, d % 5 + 2
                ch = 4 if d % 3 == 0 else 3
                buf = bytearray()
                for i in range(w * h):
                    seg, phi = i // 8, i % 8
                    se = 0 if seg % 3 == 2 else seg
                    buf.append((7 * d + 211 * se + r_off[phi]) % 256)
                    buf.append((11 * d + 197 * se + g_off[phi]) % 256)
                    buf.append((13 * d + 181 * se + b_off[phi]) % 256)
                    if ch == 4:
                        buf.append((5 * d + 23 * (i // 11)) % 256)
                blobs.append(encode_qoi(w, h, ch, bytes(buf)))
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/qoi"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


def transcode_pngs_to_qoi(df: DataFrame) -> DataFrame:
    """Media-pipeline transcode stage: PNG blobs -> QOI blobs ->
    decoded stats, in one Arrow pass (blobs never leave the
    executor). Grayscale expands to RGB (gray+alpha to RGBA) before
    re-encoding — QOI carries only 3- and 4-channel images, and the
    replicate-expansion is the standard lossless widening. The
    emitted geometry/checksum come from decoding the RE-ENCODED QOI
    bytes, so a defect in either codec or in the expansion breaks
    the closed-form oracle, not just a pytest."""

    def tx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fmts, ws, hs, chs, sums = [], [], [], [], [], []
            for d, blob in zip(pdf["doc_id"], pdf["content"]):
                meta = decode_png(bytes(blob), want_pixels=True)
                px, ch = meta["pixels"], meta["channels"]
                if ch == 1:
                    px = bytes(b for s in px for b in (s, s, s))
                    ch = 3
                elif ch == 2:
                    px = bytes(
                        b
                        for g, a in zip(px[0::2], px[1::2])
                        for b in (g, g, g, a)
                    )
                    ch = 4
                out = decode_qoi(
                    encode_qoi(meta["width"], meta["height"], ch, px)
                )
                ids.append(int(d))
                fmts.append(out["img_format"])
                ws.append(out["width"])
                hs.append(out["height"])
                chs.append(out["channels"])
                sums.append(out["pixel_sum"])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "img_format": fmts,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(chs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(tx, schema=DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# TIFF: baseline bilevel-free grayscale/RGB TIFF 6.0 (strips,
# uncompressed or PackBits, both byte orders). The remaining TIFF
# surface (LZW/JPEG-in-TIFF, tiles, planar config 2) stays a declared
# seam — a PIL-equipped deployment delegates the whole family.
# ---------------------------------------------------------------------------

def _packbits_encode(data: bytes) -> bytes:
    """Apple PackBits (TIFF 6.0 §9): literal runs <= 128, repeat runs
    <= 128 encoded as (257 - n) & 0xFF. Repeats of >= 3 switch to a
    run; the -128 no-op code is never emitted."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append((257 - run) & 0xFF)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 128 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += run
            if i - lit_start > 128:
                i = lit_start + 128
                break
        out.append(i - lit_start - 1)
        out.extend(data[lit_start:i])
    return bytes(out)


def _packbits_decode(data: bytes, n_expected: int) -> bytes:
    """Inverse of :func:`_packbits_encode`; stops exactly at
    ``n_expected`` output bytes (strip boundaries are exact in TIFF)."""
    out = bytearray()
    i = 0
    while len(out) < n_expected:
        if i >= len(data):
            raise ValueError("truncated PackBits strip")
        code = data[i]
        i += 1
        if code < 128:          # literal run of code+1 bytes
            out.extend(data[i : i + code + 1])
            i += code + 1
        elif code > 128:        # repeat next byte 257-code times
            out.extend(bytes([data[i]]) * (257 - code))
            i += 1
        # code == 128: no-op
    if len(out) != n_expected:
        raise ValueError("PackBits strip overran its expected size")
    return bytes(out)


_TIFF_COMPRESSION_NONE = 1
_TIFF_COMPRESSION_PACKBITS = 32773


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    *,
    packbits: bool = False,
    big_endian: bool = False,
    rows_per_strip: int = 2,
) -> bytes:
    """Baseline TIFF 6.0 writer: 8-bit grayscale (Photometric 1) or
    RGB (Photometric 2), row-major samples cut into strips of
    ``rows_per_strip`` rows, each strip optionally PackBits-
    compressed, in either byte order ('II' little / 'MM' big).
    Layout: header, strip data, out-of-line arrays, IFD — every
    multi-value field (BitsPerSample at 3 channels, strip tables
    past one entry) goes through a real offset indirection, so a
    reader that only handles inline values fails loudly."""
    import struct

    e = ">" if big_endian else "<"
    row_bytes = width * channels
    if len(pixels) != row_bytes * height:
        raise ValueError("pixel buffer does not match geometry")
    strips = []
    for r0 in range(0, height, rows_per_strip):
        raw = pixels[r0 * row_bytes : (r0 + min(rows_per_strip, height - r0)) * row_bytes]
        strips.append(_packbits_encode(raw) if packbits else raw)

    # TIFF 6.0 requires all field values and the IFD to begin on a
    # word (even) boundary — pad between strips (StripByteCounts
    # stays exact; the pad bytes are dead space) so the extra-array
    # region and IFD land even no matter the strip byte counts.
    pos = 8
    strip_offsets = []
    strip_blobs = []
    for s in strips:
        strip_offsets.append(pos)
        pad = len(s) & 1
        strip_blobs.append(s + b"\x00" * pad)
        pos += len(s) + pad
    extra = bytearray()
    extra_base = pos

    def put_array(fmt_ch: str, values) -> int:
        off = extra_base + len(extra)
        for v in values:
            extra.extend(struct.pack(e + fmt_ch, v))
        return off

    entries = []

    def entry(tag: int, typ: int, count: int, value: bytes):
        entries.append(struct.pack(e + "HHI", tag, typ, count) + value)

    def short_inline(v: int) -> bytes:
        return struct.pack(e + "H", v) + b"\x00\x00"

    def long_inline(v: int) -> bytes:
        return struct.pack(e + "I", v)

    n_strips = len(strips)
    entry(256, 3, 1, short_inline(width))
    entry(257, 3, 1, short_inline(height))
    if channels == 3:
        entry(258, 3, 3, long_inline(put_array("H", (8, 8, 8))))
    else:
        entry(258, 3, 1, short_inline(8))
    entry(259, 3, 1, short_inline(
        _TIFF_COMPRESSION_PACKBITS if packbits else _TIFF_COMPRESSION_NONE))
    entry(262, 3, 1, short_inline(2 if channels == 3 else 1))
    if n_strips == 1:
        entry(273, 4, 1, long_inline(strip_offsets[0]))
    else:
        entry(273, 4, n_strips, long_inline(put_array("I", strip_offsets)))
    entry(277, 3, 1, short_inline(channels))
    entry(278, 3, 1, short_inline(rows_per_strip))
    if n_strips == 1:
        entry(279, 4, 1, long_inline(len(strips[0])))
    else:
        entry(279, 4, n_strips,
              long_inline(put_array("I", [len(s) for s in strips])))

    ifd_off = extra_base + len(extra)
    ifd = struct.pack(e + "H", len(entries)) + b"".join(entries) + struct.pack(
        e + "I", 0
    )
    header = (b"MM" if big_endian else b"II") + struct.pack(
        e + "HI", 42, ifd_off
    )
    return header + b"".join(strip_blobs) + bytes(extra) + ifd


def _tiff_read_values(content, e, typ, count, value_field):
    """Read an IFD entry's values, following the offset indirection
    when the payload exceeds the 4 inline bytes. Entries whose type
    is not SHORT(3)/LONG(4) — BYTE/ASCII/RATIONAL metadata such as
    XResolution — return None so the caller can skip them instead of
    crashing on tags the baseline decoder never consumes."""
    import struct

    if typ not in (3, 4):
        return None
    fmt_ch, size = {3: ("H", 2), 4: ("I", 4)}[typ]
    total = size * count
    if total <= 4:
        buf = value_field[:total]
    else:
        (off,) = struct.unpack(e + "I", value_field)
        buf = content[off : off + total]
    return list(struct.unpack(e + f"{count}{fmt_ch}", buf))


def decode_tiff(content: bytes, want_pixels: bool = False) -> dict:
    """Decode a baseline TIFF: both byte orders, 8-bit gray/RGB,
    strip organization, Compression 1 (none) or 32773 (PackBits).
    Strip reassembly is positional — the last strip may be short
    (height not divisible by RowsPerStrip) and each PackBits strip
    must decompress to exactly its raw size, so the positional
    checksum downstream pins both. Unsupported compressions / bit
    depths raise NotImplementedError (the LZW/tiled/planar seam)."""
    import struct

    if content[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF container")
    e = "<" if content[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(e + "I", content[4:8])
    (n_entries,) = struct.unpack(e + "H", content[ifd_off : ifd_off + 2])
    tags = {}
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack(e + "HHI", content[base : base + 8])
        vals = _tiff_read_values(
            content, e, typ, count, content[base + 8 : base + 12]
        )
        if vals is not None:  # skip BYTE/ASCII/RATIONAL metadata tags
            tags[tag] = vals
    width, height = tags[256][0], tags[257][0]
    bits = tags.get(258, [8])
    compression = tags.get(259, [1])[0]
    channels = tags.get(277, [1])[0]
    if any(b != 8 for b in bits) or len(bits) != channels:
        raise NotImplementedError(
            f"only 8-bit samples supported (BitsPerSample={bits})"
        )
    if compression not in (_TIFF_COMPRESSION_NONE, _TIFF_COMPRESSION_PACKBITS):
        raise NotImplementedError(
            f"TIFF compression {compression} (LZW/JPEG/deflate) needs a "
            "full TIFF library — documented seam"
        )
    planar = tags.get(284, [1])[0]
    if planar != 1:
        # PlanarConfiguration 2 stores each channel in its own strip
        # set — the chunky reassembly below would emit wrong pixel
        # order; loud seam instead of silent mis-decode.
        raise NotImplementedError(
            f"TIFF PlanarConfiguration {planar} (planar) unsupported — "
            "only chunky (1) is implemented"
        )
    orientation = tags.get(274, [1])[0]
    if orientation != 1:
        raise NotImplementedError(
            f"TIFF Orientation {orientation} (rotated/mirrored) "
            "unsupported — only top-left (1) is implemented"
        )
    rows_per_strip = tags.get(278, [height])[0]
    offsets, counts = tags[273], tags[279]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    row_bytes = width * channels
    out = bytearray()
    for k, (off, cnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per_strip, height - k * rows_per_strip)
        raw_size = n_rows * row_bytes
        strip = content[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("truncated TIFF strip")
        if compression == _TIFF_COMPRESSION_PACKBITS:
            strip = _packbits_decode(strip, raw_size)
        elif len(strip) != raw_size:
            raise ValueError("uncompressed strip size mismatch")
        out.extend(strip)
    if len(out) != row_bytes * height:
        raise ValueError("TIFF strip reassembly size mismatch")
    meta = {
        "img_format": "tiff",
        "width": width,
        "height": height,
        "channels": channels,
        "pixel_sum": sum(out),
    }
    if want_pixels:
        meta["pixels"] = bytes(out)
    return meta


def synth_tiffs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic TIFF table: doc_id -> baseline TIFF
    bytes. Geometry w = id%6+2, h = id%5+2; RGB when id is odd else
    grayscale; PackBits when id%3 == 0 else uncompressed; big-endian
    'MM' when id%2 == 1 else 'II' (so byte order and photometric
    co-vary with parity and BOTH paths run every batch);
    RowsPerStrip=2 forces multi-strip files with a short final strip
    whenever h is odd. sample_i = (7*i + id) % 256 row-major —
    closed-form, so the SQL oracle replays geometry and both
    checksums without touching the codec. Long runs for the PackBits
    run-coding path come from docs where 7*i wraps slowly relative
    to the row length; literal runs dominate elsewhere."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 6 + 2, d % 5 + 2
                ch = 3 if d % 2 else 1
                px = bytes((7 * i + d) % 256 for i in range(w * h * ch))
                blobs.append(
                    encode_tiff(
                        w, h, px, ch,
                        packbits=(d % 3 == 0),
                        big_endian=(d % 2 == 1),
                        rows_per_strip=2,
                    )
                )
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/tiff"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


# ---------------------------------------------------------------------------
# TGA (Truevision Targa 2.0): uncompressed and RLE, 8-bit grayscale and
# 24-bit truecolor, both vertical origins, with the TGA 2.0 footer
# signature (the format has no leading magic — real dispatchers key on
# the footer, and so does decode_image here).
# ---------------------------------------------------------------------------

_TGA_FOOTER = b"\x00\x00\x00\x00\x00\x00\x00\x00TRUEVISION-XFILE.\x00"


def encode_tga(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    *,
    rle: bool = False,
    top_down: bool = True,
) -> bytes:
    """TGA 2.0 writer: row-major RGB (stored BGR per spec) or
    grayscale, image types 2/3 (uncompressed) or 10/11 (RLE),
    origin bit 5 per ``top_down``, 26-byte footer with the 2.0
    signature. RLE packets never cross row boundaries (the spec's
    encoder recommendation) — runs >= 2 become run packets, the rest
    raw packets, both capped at 128 pixels."""
    import struct

    px_bytes = channels
    row_bytes = width * px_bytes
    if len(pixels) != row_bytes * height:
        raise ValueError("pixel buffer does not match geometry")
    # RGB -> BGR storage order
    if channels == 3:
        stored = bytearray()
        for i in range(0, len(pixels), 3):
            stored += bytes((pixels[i + 2], pixels[i + 1], pixels[i]))
        stored = bytes(stored)
    else:
        stored = pixels
    rows = [
        stored[r * row_bytes : (r + 1) * row_bytes] for r in range(height)
    ]
    if not top_down:
        rows = rows[::-1]

    def rle_row(row: bytes) -> bytes:
        out = bytearray()
        px = [row[i : i + px_bytes] for i in range(0, len(row), px_bytes)]
        i, n = 0, len(px)
        while i < n:
            run = 1
            while i + run < n and run < 128 and px[i + run] == px[i]:
                run += 1
            if run >= 2:
                out.append(0x80 | (run - 1))
                out += px[i]
                i += run
                continue
            start = i
            i += 1
            while (
                i < n and i - start < 128
                and not (i + 1 < n and px[i + 1] == px[i])
            ):
                i += 1
            out.append(i - start - 1)
            out += b"".join(px[start:i])
        return bytes(out)

    body = b"".join(rle_row(r) for r in rows) if rle else b"".join(rows)
    if channels == 3:
        img_type = 10 if rle else 2
    else:
        img_type = 11 if rle else 3
    descriptor = 0x20 if top_down else 0x00
    header = struct.pack(
        "<BBBHHBHHHHBB",
        0, 0, img_type, 0, 0, 0, 0, 0, width, height,
        8 * channels, descriptor,
    )
    return header + body + _TGA_FOOTER


def decode_tga(content: bytes, want_pixels: bool = False) -> dict:
    """Decode a TGA 2.0 container (validated by the footer
    signature): types 2/3/10/11, 8/24-bit, either origin. Returns
    top-down row-major RGB/gray samples; BGR->RGB and the bottom-up
    row flip are part of the decode, so the positional checksum
    pins both. Colormapped/16-bit/interleaved TGA raises
    NotImplementedError (the declared seam)."""
    import struct

    if content[-26:] != _TGA_FOOTER:
        raise ValueError("missing TGA 2.0 footer signature")
    (id_len, cmap_type, img_type, _f, _n, _sz, _x, _y,
     width, height, depth, desc) = struct.unpack(
        "<BBBHHBHHHHBB", content[:18]
    )
    if cmap_type != 0 or img_type not in (2, 3, 10, 11):
        raise NotImplementedError(
            f"TGA type {img_type}/colormap {cmap_type} unsupported "
            "(colormapped/interleaved seam)"
        )
    channels = 3 if img_type in (2, 10) else 1
    if depth != 8 * channels:
        raise NotImplementedError(f"TGA depth {depth} unsupported")
    if desc & 0x10:
        # descriptor bit 4 = right-to-left pixel order within rows;
        # the reader below assumes left-to-right — loud seam instead
        # of silently reversed rows.
        raise NotImplementedError(
            "TGA right-to-left storage (descriptor bit 4) unsupported"
        )
    px_bytes = channels
    row_bytes = width * px_bytes
    data = content[18 + id_len : -26]
    if img_type in (10, 11):
        raw = bytearray()
        i = 0
        need = row_bytes * height
        while len(raw) < need:
            if i >= len(data):
                raise ValueError("truncated TGA RLE stream")
            hdr = data[i]
            i += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:
                raw += data[i : i + px_bytes] * count
                i += px_bytes
            else:
                raw += data[i : i + count * px_bytes]
                i += count * px_bytes
        if len(raw) != need:
            raise ValueError("TGA RLE stream overran the image size")
        data = bytes(raw)
    if len(data) < row_bytes * height:
        raise ValueError("truncated TGA pixel data")
    rows = [
        data[r * row_bytes : (r + 1) * row_bytes] for r in range(height)
    ]
    if not (desc & 0x20):          # bottom-up storage -> flip
        rows = rows[::-1]
    out = bytearray()
    for row in rows:
        if channels == 3:
            for c in range(0, len(row), 3):
                out += bytes((row[c + 2], row[c + 1], row[c]))
        else:
            out += row
    meta = {
        "img_format": "tga",
        "width": width,
        "height": height,
        "channels": channels,
        "pixel_sum": sum(out),
    }
    if want_pixels:
        meta["pixels"] = bytes(out)
    return meta


def synth_tgas(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic TGA table: doc_id -> TGA 2.0 bytes.
    Geometry w = id%7+2, h = id%4+2; truecolor when id is odd else
    grayscale; RLE when id%3 == 0; BOTTOM-UP storage when id%5 < 2
    (so the row flip and the origin bit both run);
    sample_i = (11*i + 3*id) % 256 row-major top-down — closed-form
    for the oracle. The quasi-periodic ramp yields both pixel runs
    (RLE run packets) and literal spans within rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = d % 7 + 2, d % 4 + 2
                ch = 3 if d % 2 else 1
                px = bytes((11 * i + 3 * d) % 256 for i in range(w * h * ch))
                blobs.append(
                    encode_tga(
                        w, h, px, ch,
                        rle=(d % 3 == 0),
                        top_down=(d % 5 >= 2),
                    )
                )
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "content": blobs,
                 "media_type": ["image/x-tga"] * len(ids)}
            )

    return df.select(id_col).mapInPandas(
        gen, schema="doc_id long, content binary, media_type string"
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing (aHash): the image-modality dedup signal.
# ---------------------------------------------------------------------------

def average_hash_bands(pixels: bytes, w: int, h: int, channels: int) -> list[int]:
    """64-bit average hash of an image, returned as four 16-bit band
    integers (the LSH-friendly representation: by pigeonhole, two
    hashes within Hamming distance 3 agree on at least one of the 4
    bands, so a band equi-join is a LOSSLESS candidate generator at
    that radius). All arithmetic is integer — grayscale by
    (r+g+b)//3, 8x8 nearest-neighbor subsample src=(dst*src_len)//8,
    threshold by 64*p > sum (strict, division-free) — so the SQL
    oracle replays it bit-for-bit. Bit b (row-major y*8+x) lands in
    band b//16 at position 15 - b%16."""
    g = []
    for y in range(8):
        for x in range(8):
            src = ((y * h) // 8) * w + (x * w) // 8
            if channels == 1:
                g.append(pixels[src])
            else:
                base = 3 * src
                g.append(
                    (pixels[base] + pixels[base + 1] + pixels[base + 2]) // 3
                )
    total = sum(g)
    bands = [0, 0, 0, 0]
    for b, v in enumerate(g):
        if 64 * v > total:
            bands[b // 16] |= 1 << (15 - b % 16)
    return bands


def ahash_images(df: DataFrame) -> DataFrame:
    """Per-image aHash on the standard multimodal execution shape:
    decode the container (any supported format), hash the
    reconstructed samples, emit the four band integers. Map-only —
    blobs never leave the executor; output is 5 small ints per
    image whatever the image size."""

    def hsh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf["content"]:
                m = decode_pixels(bytes(b))
                rows.append(
                    average_hash_bands(
                        m["pixels"], m["width"], m["height"], m["channels"]
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "b0": pd.Series([r[0] for r in rows], dtype="int32"),
                    "b1": pd.Series([r[1] for r in rows], dtype="int32"),
                    "b2": pd.Series([r[2] for r in rows], dtype="int32"),
                    "b3": pd.Series([r[3] for r in rows], dtype="int32"),
                }
            )

    return df.mapInPandas(
        hsh, schema="doc_id long, b0 int, b1 int, b2 int, b3 int"
    )
