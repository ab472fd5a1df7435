"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema contracts, Arrow batch
shapes, mapInPandas partitioning — and a useful codec subset decodes
NATIVELY in pure Python/stdlib: PNG (8-bit, zlib inflate + unfilter),
the binary Netpbm family (P4/P5/P6), uncompressed 24-bit BMP, and PCM
WAV audio.  Formats that genuinely need external codec libraries
(JPEG/WebP, mp3/ogg, video) stay behind honest NotImplementedError /
deterministic stubs in ``DECODERS``.  Swap a decoder entry for a real
implementation (PIL/ffmpeg) and nothing else changes: the batch
iterator, output schema, and partitioning behavior are already
exercised by tests/test_multimodal.py.

Design: binary payloads stay opaque to the JVM (BinaryType column);
feature extraction happens in Arrow-batched Python (mapInPandas) because
that is the only sensible place for codec libraries.  Batches arrive
~10k rows; decoders must be vectorized-per-row, stateless, deterministic.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, functions as F, types as T

# typed metadata contract for multimodal assets
MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("format", T.StringType(), True),        # png|wav|mp4|...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
])

FEATURE_DIM = 16


def _fake_decode_image(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decoder: derives pseudo
    dimensions + a FEATURE_DIM-dim feature vector from the payload hash.
    Replace with PIL: ``img = Image.open(io.BytesIO(payload))``."""
    h = hashlib.sha256(payload).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    feats = [round(struct.unpack(">H", h[2 * i:2 * i + 2])[0] / 65535.0, 6)
             for i in range(FEATURE_DIM)]
    return {"width": w, "height": ht, "features": feats}


def _netpbm_header(payload: bytes, magic: bytes, ntoks: int):
    """Parse a binary Netpbm header (P4/P5/P6): returns (tokens,
    pixel_offset).  Whitespace-delimited integer tokens with '#'
    comments per the Netpbm spec; pixel data starts after exactly one
    whitespace character following the last token."""
    if payload[:2] != magic:
        raise ValueError(f"not a {magic.decode()} netpbm")
    toks, i, n = [], 2, len(payload)
    while len(toks) < ntoks and i < n:
        c = payload[i:i + 1]
        if c == b"#":  # comment to end of line
            while i < n and payload[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            toks.append(int(payload[i:j]))
            i = j
    if len(toks) != ntoks:
        raise ValueError("truncated netpbm header")
    return toks, i + 1  # single whitespace after the last token


def _decode_ppm(payload: bytes):
    (w, h, maxval), off = _netpbm_header(payload, b"P6", 3)
    if not (0 < w and 0 < h and 0 < maxval < 65536):
        raise ValueError(f"bad PPM dims {w}x{h} maxval={maxval}")
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    px = payload[off:off + w * h * 3]
    if len(px) < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return w, h, px  # row-major RGB triples


def _decode_pgm(payload: bytes):
    """Binary PGM (P5, 8-bit grayscale) -> row-major RGB triples (gray
    replicated across channels, the standard gray->RGB embedding)."""
    (w, h, maxval), off = _netpbm_header(payload, b"P5", 3)
    if not (0 < w and 0 < h and 0 < maxval < 65536):
        raise ValueError(f"bad PGM dims {w}x{h} maxval={maxval}")
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    px = payload[off:off + w * h]
    if len(px) < w * h:
        raise ValueError("truncated PGM pixel data")
    out = bytearray(w * h * 3)
    out[0::3] = px
    out[1::3] = px
    out[2::3] = px
    return w, h, bytes(out)


def _decode_pbm(payload: bytes):
    """Binary PBM (P4, 1-bit) -> row-major RGB triples.  Rows are packed
    MSB-first, each row padded to a whole byte; 1 = black per spec."""
    (w, h), off = _netpbm_header(payload, b"P4", 2)
    if not (0 < w and 0 < h):
        raise ValueError(f"bad PBM dims {w}x{h}")
    stride = (w + 7) // 8
    px = payload[off:off + stride * h]
    if len(px) < stride * h:
        raise ValueError("truncated PBM pixel data")
    out = bytearray(w * h * 3)
    for y in range(h):
        rowbase = y * stride
        for x in range(w):
            bit = (px[rowbase + (x >> 3)] >> (7 - (x & 7))) & 1
            v = 0 if bit else 255
            p = (y * w + x) * 3
            out[p] = out[p + 1] = out[p + 2] = v
    return w, h, bytes(out)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(payload: bytes):
    """Pure-stdlib PNG decode (zlib inflate + per-scanline unfilter) ->
    (w, h, row-major RGB).  Supports 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced —
    the overwhelming majority of real-world PNGs.  Alpha is dropped
    (features come from color channels).  Chunk CRCs are not verified:
    truncation/corruption surfaces as a zlib or length error instead."""
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, n = 8, len(payload)
    w = h = bitd = colort = interlace = None
    idat, plte = [], None
    while i + 8 <= n:
        ln = struct.unpack(">I", payload[i:i + 4])[0]
        typ = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            bitd, colort, comp, filt, interlace = data[8:13]
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter")
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        i += 12 + ln  # length + type + data + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if not (0 < w and 0 < h):
        raise ValueError(f"bad PNG dims {w}x{h}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if bitd != 8:
        raise ValueError(f"PNG bit depth {bitd} not supported")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(colort)
    if ch is None:
        raise ValueError(f"PNG color type {colort}")
    if colort == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette PNG missing/odd PLTE")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) < (stride + 1) * h:
        raise ValueError("truncated PNG pixel data")
    out = bytearray(stride * h)
    for y in range(h):
        base = y * (stride + 1)
        ft = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        o = y * stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ft == 2:  # Up
            if y:
                for x in range(stride):
                    line[x] = (line[x] + out[o - stride + x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = out[o - stride + x] if y else 0
                line[x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = out[o - stride + x] if y else 0
                c = out[o - stride + x - ch] if (y and x >= ch) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft}")
        out[o:o + stride] = line
    if colort == 2:
        return w, h, bytes(out)
    rgb = bytearray(w * h * 3)
    if colort == 0:
        rgb[0::3] = out
        rgb[1::3] = out
        rgb[2::3] = out
    elif colort == 4:
        g = out[0::2]
        rgb[0::3] = g
        rgb[1::3] = g
        rgb[2::3] = g
    elif colort == 6:
        rgb[0::3] = out[0::4]
        rgb[1::3] = out[1::4]
        rgb[2::3] = out[2::4]
    else:  # palette
        npal = len(plte) // 3
        for j, idx in enumerate(out):
            if idx >= npal:
                raise ValueError("PNG palette index out of range")
            rgb[3 * j:3 * j + 3] = plte[3 * idx:3 * idx + 3]
    return w, h, bytes(rgb)


def encode_png(width: int, height: int, rgb: bytes,
               filter_type: int = 0) -> bytes:
    """Minimal PNG (8-bit RGB, non-interlaced) encoder — the write side
    of _decode_png for tests and payload synthesis.  ``filter_type``
    applies one filter to every scanline (0/1/2 supported) so decode
    paths are exercisable."""
    import zlib
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    stride = width * 3
    lines = []
    for y in range(height):
        row = bytearray(rgb[y * stride:(y + 1) * stride])
        if filter_type == 0:
            pass
        elif filter_type == 1:
            for x in range(stride - 1, 2, -1):
                row[x] = (row[x] - row[x - 3]) & 0xFF
        elif filter_type == 2:
            if y:
                prev = rgb[(y - 1) * stride:y * stride]
                for x in range(stride):
                    row[x] = (row[x] - prev[x]) & 0xFF
        else:
            raise ValueError("encode_png filter 0/1/2 only")
        lines.append(bytes([filter_type]) + bytes(row))
    comp = zlib.compress(b"".join(lines))

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + typ + data \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) \
        + chunk(b"IEND", b"")


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (w, h, row-major
    RGB bytes).  BMP stores rows bottom-up, BGR, padded to 4 bytes."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BMP core header not supported")
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP (got bpp={bpp}, "
                         f"compression={comp})")
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dims {w}x{h}")
    flipped = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(w * h * 3)
    for row in range(h):
        src = data_off + (h - 1 - row if flipped else row) * stride
        dst = row * w * 3
        line = payload[src:src + w * 3]
        end = dst + w * 3
        # BGR -> RGB
        out[dst + 0:end:3] = line[2::3]
        out[dst + 1:end:3] = line[1::3]
        out[dst + 2:end:3] = line[0::3]
    return w, h, bytes(out)


def _rgb_features(px: bytes, w: int, h: int) -> list[float]:
    """FEATURE_DIM(16) real image features from row-major RGB bytes:
    mean R/G/B, overall mean luma, then a 4x3 grid of cell mean lumas —
    deterministic, pure Python (no numpy needed for the tiny per-row
    work; the batch-level parallelism comes from mapInPandas)."""
    n = w * h
    sr = sum(px[0::3])
    sg = sum(px[1::3])
    sb = sum(px[2::3])
    luma_scale = (0.299 * sr + 0.587 * sg + 0.114 * sb) / (255.0 * n)
    feats = [sr / (255.0 * n), sg / (255.0 * n), sb / (255.0 * n),
             luma_scale]
    for gy in range(3):
        y0, y1 = h * gy // 3, h * (gy + 1) // 3
        for gx in range(4):
            x0, x1 = w * gx // 4, w * (gx + 1) // 4
            tot, cnt = 0.0, 0
            for y in range(y0, y1):
                base = (y * w + x0) * 3
                row = px[base:base + (x1 - x0) * 3]
                tot += (0.299 * sum(row[0::3]) + 0.587 * sum(row[1::3])
                        + 0.114 * sum(row[2::3]))
                cnt += x1 - x0
            feats.append(tot / (255.0 * cnt) if cnt else 0.0)
    return [round(f, 6) for f in feats]


def decode_image_real(payload: bytes) -> dict:
    """REAL image decode for the codec-less sandbox: PNG (8-bit,
    stdlib-zlib inflate), the full binary Netpbm family — PPM (P6),
    PGM (P5), PBM (P4) — and uncompressed 24-bit BMP all parse
    natively (pure Python); formats that genuinely need codec
    libraries (JPEG/WebP/...) raise NotImplementedError so the error
    surfaces in ``decode_error`` instead of a wrong value."""
    if payload[:8] == _PNG_SIG:
        w, h, px = _decode_png(payload)
    elif payload[:2] == b"P6":
        w, h, px = _decode_ppm(payload)
    elif payload[:2] == b"P5":
        w, h, px = _decode_pgm(payload)
    elif payload[:2] == b"P4":
        w, h, px = _decode_pbm(payload)
    elif payload[:2] == b"BM":
        w, h, px = _decode_bmp(payload)
    else:
        raise NotImplementedError(
            "codec libraries (PIL/soundfile/ffmpeg) are not installed in "
            "this environment; PNG, Netpbm P4/P5/P6 and 24-bit BMP "
            "decode natively, other formats need a library or the "
            "deterministic fake")
    return {"width": w, "height": h, "features": _rgb_features(px, w, h)}


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6) encoder — the write side of _decode_ppm, used to
    synthesize REAL image payloads in tests and by resize_images."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


AUDIO_FEATURE_SEGS = 8


def _parse_wav(payload: bytes):
    """RIFF/WAVE chunk walk -> (channels, sample_rate, bits, data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    i, n = 12, len(payload)
    fmt = data = None
    while i + 8 <= n:
        cid = payload[i:i + 4]
        sz = struct.unpack("<I", payload[i + 4:i + 8])[0]
        body = payload[i + 8:i + 8 + sz]
        if len(body) < sz:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    afmt, nch, rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if afmt != 1:
        raise ValueError(f"WAV non-PCM format {afmt} not supported")
    if bits not in (8, 16):
        raise ValueError(f"WAV {bits}-bit not supported")
    if nch < 1 or rate == 0:
        raise ValueError("bad WAV fmt chunk")
    return nch, rate, bits, data


def decode_audio_real(payload: bytes) -> dict:
    """REAL audio decode: PCM WAV (8/16-bit, any channel count) parses
    natively via struct — sample rate, duration, and per-segment RMS
    energy features (AUDIO_FEATURE_SEGS segments + overall).  Compressed
    formats (mp3/ogg/flac) raise NotImplementedError so the error lands
    in ``decode_error``."""
    import math
    if payload[:4] != b"RIFF":
        raise NotImplementedError(
            "audio codec libraries are not installed; PCM WAV decodes "
            "natively, compressed formats need a library")
    nch, rate, bits, data = _parse_wav(payload)
    try:
        import numpy as np
    except ImportError:  # pragma: no cover - numpy is baked in
        np = None
    if np is not None:
        # vectorized path: frombuffer + reshape mixdown + segment RMS
        # (a 4 kHz·multi-second corpus is tens of millions of samples —
        # per-sample Python costs ~50x)
        if bits == 16:
            cnt = len(data) // 2
            arr = np.frombuffer(data[:cnt * 2], dtype="<i2") \
                .astype(np.float64)
            scale = 32768.0
        else:
            arr = np.frombuffer(data, dtype=np.uint8) \
                .astype(np.float64) - 128.0
            scale = 128.0
        frames = len(arr) // nch
        if frames == 0:
            raise ValueError("empty WAV data")
        mono = arr[:frames * nch].reshape(frames, nch).mean(axis=1) \
            if nch > 1 else arr[:frames]
        x2 = (mono / scale) ** 2
        feats = []
        for s in range(AUDIO_FEATURE_SEGS):
            a = frames * s // AUDIO_FEATURE_SEGS
            b = frames * (s + 1) // AUDIO_FEATURE_SEGS
            feats.append(round(float(np.sqrt(x2[a:b].mean())), 6)
                         if b > a else 0.0)
        feats.append(round(float(np.sqrt(x2.mean())), 6))
        return {"sample_rate": rate,
                "duration_ms": frames * 1000 // rate,
                "channels": nch, "features": feats}
    if bits == 16:
        cnt = len(data) // 2
        samples = struct.unpack(f"<{cnt}h", data[:cnt * 2])
        scale = 32768.0
    else:
        samples = [b - 128 for b in data]
        scale = 128.0
    frames = len(samples) // nch
    if frames == 0:
        raise ValueError("empty WAV data")
    mono = samples if nch == 1 else \
        [sum(samples[j * nch:(j + 1) * nch]) / nch for j in range(frames)]
    feats = []
    for s in range(AUDIO_FEATURE_SEGS):
        a = frames * s // AUDIO_FEATURE_SEGS
        b = frames * (s + 1) // AUDIO_FEATURE_SEGS
        seg = mono[a:b]
        feats.append(
            round(math.sqrt(sum((x / scale) ** 2 for x in seg)
                            / len(seg)), 6) if seg else 0.0)
    feats.append(round(math.sqrt(
        sum((x / scale) ** 2 for x in mono) / frames), 6))
    return {"sample_rate": rate,
            "duration_ms": frames * 1000 // rate,
            "channels": nch, "features": feats}


def encode_wav(sample_rate: int, samples, channels: int = 1) -> bytes:
    """Minimal 16-bit PCM WAV encoder — the write side of
    decode_audio_real for tests and payload synthesis."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


AUDIO_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.DoubleType()), True),
    T.StructField("decode_error", T.StringType(), True),
])


def extract_audio_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "asset_id") -> DataFrame:
    """Decode + featurize binary audio assets via Arrow-batched
    mapInPandas (narrow, partition-preserving) — same exception-model
    contract as extract_features: bad assets land in decode_error."""

    def run(batches):
        import pandas as pd
        for pdf in batches:
            rows = {k: [] for k in ("asset_id", "sample_rate",
                                    "duration_ms", "channels",
                                    "features", "decode_error")}
            for i in range(len(pdf)):
                rows["asset_id"].append(int(pdf[id_col].iloc[i]))
                payload = pdf[payload_col].iloc[i]
                try:
                    d = decode_audio_real(
                        bytes(payload) if payload is not None else b"")
                    rows["sample_rate"].append(d["sample_rate"])
                    rows["duration_ms"].append(d["duration_ms"])
                    rows["channels"].append(d["channels"])
                    rows["features"].append(d["features"])
                    rows["decode_error"].append(None)
                except Exception as e:
                    for k in ("sample_rate", "duration_ms", "channels",
                              "features"):
                        rows[k].append(None)
                    rows["decode_error"].append(
                        f"{type(e).__name__}: {e}")
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=AUDIO_SCHEMA)


DECODERS = {
    "image/fake": _fake_decode_image,
    "image/real": decode_image_real,
}

EXTRACT_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.DoubleType()), True),
    T.StructField("decode_error", T.StringType(), True),
])


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "asset_id",
                     decoder: str = "image/fake") -> DataFrame:
    """Decode + featurize binary assets via Arrow-batched mapInPandas.
    Per-row decode failures land in ``decode_error`` (exception-model
    style: bad assets never kill the job)."""
    decode = DECODERS[decoder]

    def run(batches):
        import pandas as pd
        for pdf in batches:
            ids, ws, hs, fs, errs = [], [], [], [], []
            for i in range(len(pdf)):
                ids.append(int(pdf[id_col].iloc[i]))
                payload = pdf[payload_col].iloc[i]
                try:
                    d = decode(bytes(payload) if payload is not None else b"")
                    ws.append(d["width"])
                    hs.append(d["height"])
                    fs.append(d["features"])
                    errs.append(None)
                except Exception as e:
                    ws.append(None)
                    hs.append(None)
                    fs.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({"asset_id": ids, "width": ws, "height": hs,
                                "features": fs, "decode_error": errs})

    return df.mapInPandas(run, schema=EXTRACT_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("resize_error", T.StringType(), True),
])


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resizer: the output payload is a
    pure function of (payload, dims).  Replace with PIL:
    ``Image.open(io.BytesIO(p)).resize((w, h)).save(buf, fmt)``."""
    return hashlib.sha256(
        payload + struct.pack(">II", width, height)).digest()


def _resize_rgb_nearest(px: bytes, w: int, h: int,
                        nw: int, nh: int) -> bytes:
    """Nearest-neighbor RGB resample (the real thing, pure Python)."""
    out = bytearray(nw * nh * 3)
    for y in range(nh):
        sy = y * h // nh
        row_base = sy * w * 3
        dst = y * nw * 3
        for x in range(nw):
            sx = x * w // nw
            s = row_base + sx * 3
            out[dst:dst + 3] = px[s:s + 3]
            dst += 3
    return bytes(out)


def _resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """PPM(P6) and PNG payloads get a REAL nearest-neighbor resize
    (round-tripping through their decoders/encoders); anything else
    falls back to the deterministic stub — same honest split as
    decode_image_real."""
    if payload[:2] == b"P6":
        w, h, px = _decode_ppm(payload)
        return encode_ppm(width, height,
                          _resize_rgb_nearest(px, w, h, width, height))
    if payload[:8] == _PNG_SIG:
        w, h, px = _decode_png(payload)
        return encode_png(width, height,
                          _resize_rgb_nearest(px, w, h, width, height))
    return _fake_resize(payload, width, height)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  id_col: str = "asset_id") -> DataFrame:
    """Resize binary image assets to (width, height) via Arrow-batched
    mapInPandas — narrow (partition-preserving), per-row failures land in
    ``resize_error``.  PPM(P6) payloads get a real nearest-neighbor
    resample; other formats use the deterministic stub (codec libraries
    are env-gated), and the Spark contract (schema, batching, error
    capture) is identical either way."""

    def run(batches):
        import pandas as pd
        for pdf in batches:
            ids, outs, errs = [], [], []
            for i in range(len(pdf)):
                ids.append(int(pdf[id_col].iloc[i]))
                payload = pdf[payload_col].iloc[i]
                try:
                    outs.append(_resize_payload(
                        bytes(payload) if payload is not None else b"",
                        width, height))
                    errs.append(None)
                except Exception as e:
                    outs.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({
                "asset_id": ids, "payload": outs,
                "width": [width] * len(ids), "height": [height] * len(ids),
                "resize_error": errs})

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("frame_index", T.IntegerType(), False),
    T.StructField("ts_ms", T.LongType(), False),
    T.StructField("frame", T.BinaryType(), True),
])


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  payload_col: str = "payload", id_col: str = "asset_id",
                  duration_col: str = "meta.duration_ms",
                  max_frames: int = 64) -> DataFrame:
    """Sample one frame every ``every_ms`` from video assets — the
    1-row-in, N-rows-out shape (mapInPandas yields more rows than it
    consumes; still narrow, no shuffle).  Frame payloads come from the
    deterministic stub (replace with ffmpeg seek+decode); frame COUNT is
    ceil(duration / every_ms) capped at ``max_frames`` so one corrupt
    duration can't explode a batch."""
    dur = F.expr(duration_col).cast("long")
    staged = df.select(
        F.col(id_col).alias("asset_id"), F.col(payload_col).alias("p"),
        F.coalesce(dur, F.lit(0)).alias("dur"))

    def run(batches):
        import pandas as pd
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for i in range(len(pdf)):
                aid = int(pdf["asset_id"].iloc[i])
                payload = pdf["p"].iloc[i]
                payload = bytes(payload) if payload is not None else b""
                dur_ms = int(pdf["dur"].iloc[i])
                n = min(max(-(-dur_ms // every_ms), 1), max_frames)
                for j in range(n):
                    ids.append(aid)
                    idxs.append(j)
                    tss.append(j * every_ms)
                    frames.append(hashlib.sha256(
                        payload + struct.pack(">I", j)).digest())
            yield pd.DataFrame({"asset_id": ids, "frame_index": idxs,
                                "ts_ms": tss, "frame": frames})

    return staged.mapInPandas(run, schema=FRAME_SCHEMA)


def make_asset_frame(spark, n: int = 100, partitions: int = 4,
                     media_type: str = "image") -> DataFrame:
    """Synthetic binary-asset table for tests: payload = deterministic
    bytes derived from the id (seeded, reproducible).  ``video`` assets
    get a deterministic duration_ms so frame sampling is testable."""
    ids = spark.range(n, numPartitions=partitions) \
        .select(F.col("id").alias("asset_id"))
    payload = F.sha2(F.col("asset_id").cast("string"), 256).cast("binary")
    dur = (F.col("asset_id") % 5 * 1700 + 500).cast("long") \
        if media_type == "video" else F.lit(None).cast("long")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        dur.alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"))
    return ids.select("asset_id", payload.alias("payload"),
                      meta.alias("meta"))
