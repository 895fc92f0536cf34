"""Multimodal column plumbing: opaque binary payloads with typed
metadata, processed by Arrow-batched kernels.

The image/audio decode libraries are not in this container, so the
decode step is STUBBED behind ``decoder=`` hooks (a deterministic fake
by default, clearly marked); everything Spark-side — schema, batch
iteration, partitioning, output shape — is real and tested. Swapping in
a real decoder (PIL / torchaudio / pyav) changes one function.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image|audio|video
    T.StructField("payload", T.BinaryType(), False),  # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])


def synthetic_media(spark: SparkSession, n: int, seed: int = 42,
                    partitions: int = 8) -> DataFrame:
    """Deterministic fake media table. Payload bytes follow a closed
    arithmetic form — ``byte[k] = (id*131 + k*17 + seed) % 256`` over a
    length of ``256 + (id*37) % 256`` — so an independent engine
    (the DuckDB oracle) can reproduce the exact bytes/feature sums and
    strict-equality-gate the whole mapInPandas pipeline, which an RNG
    payload cannot. The plumbing (binary column built per Arrow batch,
    nullable typed metadata) is unchanged from a real media table."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                length = 256 + (i * 37) % 256
                payload = bytes(((i * 131 + np.arange(length) * 17 + seed)
                                 % 256).astype(np.uint8))
                rows.append({
                    "media_id": i,
                    "kind": kind,
                    "payload": payload,
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                    "width": 64 + (i * 13) % 1856 if kind != "audio" else None,
                    "height": 64 + (i * 11) % 1016 if kind != "audio" else None,
                    "duration_ms": (500 + (i * 197) % 59500
                                    if kind != "image" else None),
                })
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def synthetic_wav_media(spark: SparkSession, n: int, seed: int = 42,
                        sample_rate: int = 8000,
                        partitions: int = 8) -> DataFrame:
    """REAL RIFF/WAVE payloads (PCM16 mono), built with the stdlib
    ``wave`` writer — unlike :func:`synthetic_media` these are genuine
    decodable media bytes, no decode library required. Samples follow a
    closed arithmetic form so an independent engine can reproduce the
    decoded amplitude stats exactly:

        n_samples(i) = 64 + (i * 31) % 192
        sample(i, k) = ((i * 7919 + k * 104729 + seed) % 65536) - 32768
    """
    import io
    import wave

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                ns = 64 + (i * 31) % 192
                k = np.arange(ns, dtype=np.int64)
                samples = ((i * 7919 + k * 104729 + seed) % 65536
                           - 32768).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(samples.tobytes())
                rows.append({"media_id": i, "kind": "audio",
                             "payload": buf.getvalue(),
                             "mime": "audio/wav", "width": None,
                             "height": None,
                             "duration_ms": ns * 1000 // sample_rate})
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def wav_amplitude_stats(df: DataFrame) -> DataFrame:
    """REAL decode of WAV payloads (stdlib ``wave`` — no external
    decode libs) to integer amplitude statistics, one mapInPandas pass:
    ``(media_id, n_samples, sample_rate, sum_abs, max_abs, sum_sq)``.
    Integer outputs on purpose: they strict-gate against a DuckDB
    oracle that re-derives the samples arithmetically — a float RMS
    would only bound-gate."""
    import io
    import wave

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as w:
                    if w.getsampwidth() != 2 or w.getnchannels() != 1:
                        raise NotImplementedError(
                            "only PCM16 mono decoded here")
                    sr = w.getframerate()
                    raw = w.readframes(w.getnframes())
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                a = np.abs(s)
                out.append({"media_id": int(mid),
                            "n_samples": int(s.size),
                            "sample_rate": int(sr),
                            "sum_abs": int(a.sum()),
                            "max_abs": int(a.max()) if s.size else 0,
                            "sum_sq": int((s * s).sum())})
            yield pd.DataFrame(out)

    return df.mapInPandas(
        per_batch,
        schema="media_id long, n_samples long, sample_rate long, "
               "sum_abs long, max_abs long, sum_sq long")


def synthetic_bmp_media(spark: SparkSession, n: int, seed: int = 42,
                        partitions: int = 8) -> DataFrame:
    """REAL BMP payloads (uncompressed BITMAPINFOHEADER, 24-bit BGR,
    bottom-up, 4-byte-aligned rows) built with stdlib struct + numpy —
    genuine decodable image bytes, no imaging library required. Pixels
    follow a closed arithmetic form so an independent engine can
    reproduce the decoded channel sums exactly:

        w(i) = 4 + (i * 3) % 29          (odd widths exercise padding)
        h(i) = 2 + (i * 5) % 17
        channel c of pixel (x, y) of image i =
            (i * 31 + y * 7 + x * 13 + c * 101 + seed) % 256
    """
    import struct as _struct

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                w = 4 + (i * 3) % 29
                h = 2 + (i * 5) % 17
                y, x, c = np.meshgrid(np.arange(h), np.arange(w),
                                      np.arange(3), indexing="ij")
                # pixel array is RGB by c; BMP stores BGR => reverse c
                px = ((i * 31 + y * 7 + x * 13 + c * 101 + seed)
                      % 256).astype(np.uint8)
                bgr = px[:, :, ::-1]
                stride = (w * 3 + 3) & ~3
                rowbytes = np.zeros((h, stride), dtype=np.uint8)
                rowbytes[:, :w * 3] = bgr.reshape(h, w * 3)
                # bottom-up scanline order
                data = rowbytes[::-1].tobytes()
                header = _struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54)
                info = _struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                    2835, 2835, 0, 0)
                rows.append({"media_id": i, "kind": "image",
                             "payload": header + info + data,
                             "mime": "image/bmp", "width": w,
                             "height": h, "duration_ms": None})
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def bmp_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL decode of 24-bit uncompressed BMP payloads (stdlib struct +
    numpy — no imaging libs) to integer per-channel statistics in one
    mapInPandas pass: ``(media_id, width, height, sum_r, sum_g, sum_b,
    max_luma_x100)``. Integer outputs strict-gate against a DuckDB
    oracle that re-derives every pixel arithmetically."""
    import struct as _struct

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:2] != b"BM":
                    raise ValueError("not a BMP payload")
                off = _struct.unpack_from("<I", raw, 10)[0]
                hsz, w, h, _pl, bpp, comp = _struct.unpack_from(
                    "<IiiHHI", raw, 14)
                if bpp != 24 or comp != 0:
                    raise NotImplementedError(
                        "only 24-bit uncompressed BMP decoded here")
                stride = (w * 3 + 3) & ~3
                arr = np.frombuffer(raw, dtype=np.uint8, offset=off,
                                    count=h * stride).reshape(h, stride)
                bgr = arr[::-1, :w * 3].reshape(h, w, 3)
                rgb = bgr[:, :, ::-1].astype(np.int64)
                # integer luma proxy: 30R + 59G + 11B (x100 Rec.601)
                luma = (30 * rgb[..., 0] + 59 * rgb[..., 1]
                        + 11 * rgb[..., 2])
                out.append({"media_id": int(mid), "width": int(w),
                            "height": int(h),
                            "sum_r": int(rgb[..., 0].sum()),
                            "sum_g": int(rgb[..., 1].sum()),
                            "sum_b": int(rgb[..., 2].sum()),
                            "max_luma_x100": int(luma.max())})
            yield pd.DataFrame(out)

    return df.mapInPandas(
        per_batch,
        schema="media_id long, width long, height long, sum_r long, "
               "sum_g long, sum_b long, max_luma_x100 long")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor (RFC 2083 §6.6), vectorized over channels."""
    p = a.astype(np.int64) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a,
                    np.where(pb <= pc, b, c)).astype(np.int64)


def synthetic_png_media(spark: SparkSession, n: int, seed: int = 42,
                        partitions: int = 8) -> DataFrame:
    """REAL PNG payloads (8-bit truecolor RGB, zlib-compressed IDAT,
    CRC-correct chunks) built with stdlib struct + zlib + numpy — the
    compressed-format sibling of :func:`synthetic_bmp_media` (round-4
    codec-gap closure: PNG's DEFLATE stream is the one compressed
    format decodable with the stdlib alone). Scanline filters CYCLE
    through all five PNG filter types (``filter(i, y) = (i + y) % 5``)
    so the decoder's unfilter logic — not just the zlib call — is
    genuinely exercised. Pixels follow a closed arithmetic form so an
    independent engine reproduces the decoded channel sums exactly:

        w(i) = 4 + (i * 7) % 29
        h(i) = 2 + (i * 5) % 17
        channel c of pixel (x, y) of image i =
            (i * 29 + y * 11 + x * 19 + c * 73 + seed) % 256
    """
    import struct as _struct
    import zlib as _zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (_struct.pack(">I", len(data)) + tag + data
                + _struct.pack(">I", _zlib.crc32(tag + data)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                w = 4 + (i * 7) % 29
                h = 2 + (i * 5) % 17
                y, x, c = np.meshgrid(np.arange(h), np.arange(w),
                                      np.arange(3), indexing="ij")
                px = ((i * 29 + y * 11 + x * 19 + c * 73 + seed)
                      % 256).astype(np.int64)
                raw = px.reshape(h, w * 3)
                prior = np.zeros(w * 3, dtype=np.int64)
                out = bytearray()
                for r in range(h):
                    row = raw[r]
                    left = np.concatenate([[0, 0, 0], row[:-3]])
                    ul = np.concatenate([[0, 0, 0], prior[:-3]])
                    f = (i + r) % 5
                    if f == 0:
                        filt = row
                    elif f == 1:
                        filt = row - left
                    elif f == 2:
                        filt = row - prior
                    elif f == 3:
                        filt = row - (left + prior) // 2
                    else:
                        filt = row - _paeth(left, prior, ul)
                    out.append(f)
                    out.extend((filt % 256).astype(np.uint8).tobytes())
                    prior = row
                ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                payload = (b"\x89PNG\r\n\x1a\n"
                           + chunk(b"IHDR", ihdr)
                           + chunk(b"IDAT", _zlib.compress(bytes(out), 6))
                           + chunk(b"IEND", b""))
                rows.append({"media_id": i, "kind": "image",
                             "payload": payload, "mime": "image/png",
                             "width": w, "height": h, "duration_ms": None})
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def png_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL decode of 8-bit truecolor PNG payloads — stdlib zlib +
    struct + numpy, no imaging library: chunk walk with CRC
    verification, DEFLATE inflate of the IDAT stream, and full
    scanline UNFILTERING for all five PNG filter types (None / Sub /
    Up / Average / Paeth, RFC 2083 §6) — in one mapInPandas pass to
    integer per-channel statistics ``(media_id, width, height, sum_r,
    sum_g, sum_b, max_luma_x100)``. Integer outputs strict-gate
    against a DuckDB oracle that re-derives every pixel
    arithmetically, so the zlib round-trip AND the unfilter math are
    both inside the gate."""
    import struct as _struct
    import zlib as _zlib

    def decode(raw: bytes) -> tuple[int, int, np.ndarray]:
        if raw[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG payload")
        pos, w = 8, None
        idat = bytearray()
        while pos < len(raw):
            (ln,) = _struct.unpack_from(">I", raw, pos)
            tag = raw[pos + 4:pos + 8]
            data = raw[pos + 8:pos + 8 + ln]
            (crc,) = _struct.unpack_from(">I", raw, pos + 8 + ln)
            if _zlib.crc32(tag + data) != crc:
                raise ValueError(f"bad CRC in {tag!r} chunk")
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, ilace = _struct.unpack(
                    ">IIBBBBB", data)
                if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                    raise NotImplementedError(
                        "only 8-bit truecolor non-interlaced PNG here")
            elif tag == b"IDAT":
                idat.extend(data)
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if w is None:
            raise ValueError("missing IHDR")
        flat = np.frombuffer(_zlib.decompress(bytes(idat)),
                             dtype=np.uint8).astype(np.int64)
        stride = w * 3
        if flat.size != h * (stride + 1):
            raise ValueError("IDAT size mismatch")
        lines = flat.reshape(h, stride + 1)
        out = np.zeros((h, stride), dtype=np.int64)
        prior = np.zeros(stride, dtype=np.int64)
        for r in range(h):
            f, filt = int(lines[r, 0]), lines[r, 1:]
            if f == 0:
                row = filt.copy()
            elif f == 2:
                row = (filt + prior) % 256
            else:
                # Sub/Average/Paeth depend on the decoded left pixel:
                # sequential over pixels, vectorized over channels
                row = np.zeros(stride, dtype=np.int64)
                for k in range(0, stride, 3):
                    a = row[k - 3:k] if k else np.zeros(3, dtype=np.int64)
                    b = prior[k:k + 3]
                    c = (prior[k - 3:k] if k
                         else np.zeros(3, dtype=np.int64))
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    elif f == 4:
                        pred = _paeth(a, b, c)
                    else:
                        raise ValueError(f"bad filter type {f}")
                    row[k:k + 3] = (filt[k:k + 3] + pred) % 256
            out[r] = row
            prior = row
        return w, h, out.reshape(h, w, 3)

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rgb = decode(bytes(payload))
                luma = (30 * rgb[..., 0] + 59 * rgb[..., 1]
                        + 11 * rgb[..., 2])
                out.append({"media_id": int(mid), "width": int(w),
                            "height": int(h),
                            "sum_r": int(rgb[..., 0].sum()),
                            "sum_g": int(rgb[..., 1].sum()),
                            "sum_b": int(rgb[..., 2].sum()),
                            "max_luma_x100": int(luma.max())})
            yield pd.DataFrame(out)

    return df.mapInPandas(
        per_batch,
        schema="media_id long, width long, height long, sum_r long, "
               "sum_g long, sum_b long, max_luma_x100 long")


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW compression (GIF89a spec appendix F): dictionary
    starts at 2^mcs singles + CLEAR + END, codes grow to 12 bits, the
    table resets via CLEAR when full. LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    prefix: tuple = ()
    for sym in indices.tolist():
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], code_size)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prefix = (sym,)
    if prefix:
        emit(table[prefix], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> np.ndarray:
    """GIF-variant LZW decompression — the exact inverse walk: codes
    read LSB-first at growing widths, KwKwK case handled, table reset
    on CLEAR, stop at END."""
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0       # bit position
    total = len(data) * 8
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal pos
        if pos + code_size > total:
            return end
        byte0 = pos >> 3
        chunk = int.from_bytes(data[byte0:byte0 + 3], "little")
        code = (chunk >> (pos & 7)) & ((1 << code_size) - 1)
        pos += code_size
        return code

    while True:
        code = read_code()
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):          # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} "
                             f"beyond table size {len(table)}")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _gif_interlace_order(ih: int) -> np.ndarray:
    """GIF 4-pass interlace row schedule: order[k] = the image row the
    k-th STORED row belongs to (pass 1: rows 0,8,16...; pass 2:
    4,12...; pass 3: 2,6,10...; pass 4: odd rows). Interlacing only
    permutes row storage order — pixel content is unchanged, which is
    why the arithmetic oracle needs no change for interlaced fixtures."""
    return np.concatenate([np.arange(0, ih, 8), np.arange(4, ih, 8),
                           np.arange(2, ih, 4), np.arange(1, ih, 2)])


def _gif_palette() -> np.ndarray:
    """256-entry arithmetic palette (so the decoder's palette mapping
    is inside the strict gate): entry j = ((j*7)%256,(j*11)%256,
    (j*13)%256)."""
    j = np.arange(256, dtype=np.int64)
    return np.stack([(j * 7) % 256, (j * 11) % 256, (j * 13) % 256],
                    axis=1).astype(np.uint8)


def synthetic_gif_media(spark: SparkSession, n: int, seed: int = 42,
                        partitions: int = 8,
                        interlace_every: int | None = 3) -> DataFrame:
    """REAL GIF87a payloads — hand-rolled GIF-variant LZW compression
    (dictionary growth to 12-bit codes, CLEAR-code table resets,
    LSB-first packing, 255-byte sub-block framing) over an 8-bit
    global color table, stdlib + numpy only (round-4 second
    compressed codec after PNG; GIF's LZW needs no external lib).
    Pixel INDICES follow a closed arithmetic form so an independent
    engine reproduces the decoded RGB sums exactly through the same
    arithmetic palette:

        w(i) = 6 + (i * 5) % 27
        h(i) = 3 + (i * 7) % 13
        index of pixel (x, y) of image i =
            (i * 17 + y * 23 + x * 29 + seed) % 256

    Every ``interlace_every``-th image (i % interlace_every == 0;
    None disables) is stored INTERLACED — rows written in the GIF
    4-pass schedule with the descriptor interlace flag set — so the
    strict oracle gate covers the deinterlace path on real fixtures
    (round-5; interlacing permutes row storage only, pixel content
    and therefore the arithmetic oracle are unchanged).
    """
    import struct as _struct

    pal = _gif_palette().tobytes()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                w = 6 + (i * 5) % 27
                h = 3 + (i * 7) % 13
                y, x = np.meshgrid(np.arange(h), np.arange(w),
                                   indexing="ij")
                idx2d = ((i * 17 + y * 23 + x * 29 + seed)
                         % 256).astype(np.uint8)
                interlaced = bool(interlace_every
                                  and i % interlace_every == 0)
                if interlaced:
                    idx2d = idx2d[_gif_interlace_order(h)]
                idx = idx2d.reshape(-1)
                lzw = _lzw_encode(idx, 8)
                blocks = bytearray()
                for off in range(0, len(lzw), 255):
                    chunk = lzw[off:off + 255]
                    blocks.append(len(chunk))
                    blocks.extend(chunk)
                blocks.append(0)  # block terminator
                payload = (b"GIF87a"
                           + _struct.pack("<HHBBB", w, h,
                                          0xF7, 0, 0)  # GCT, 256 colors
                           + pal
                           + b"\x2C" + _struct.pack(
                               "<HHHHB", 0, 0, w, h,
                               0x40 if interlaced else 0)
                           + bytes([8])  # LZW min code size
                           + bytes(blocks)
                           + b"\x3B")
                rows.append({"media_id": i, "kind": "image",
                             "payload": payload, "mime": "image/gif",
                             "width": w, "height": h,
                             "duration_ms": None})
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def gif_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL decode of GIF87a payloads — header/descriptor parse,
    sub-block reassembly, full GIF-LZW decompression (growing code
    widths, CLEAR resets, KwKwK), 4-pass DEINTERLACING (round 5),
    palette mapping — stdlib + numpy only, one mapInPandas pass to
    integer per-channel statistics. Strict-gated against a DuckDB
    oracle that re-derives every pixel index and palette entry
    arithmetically, so the LZW round-trip is inside the gate; the
    row-position-weighted ``ypos_luma`` column is what gates the
    deinterlace path (channel sums are permutation-invariant).
    GIF89a extensions (incl. the transparency GCE) are parsed and
    skipped: stats are over stored palette colors — transparency is a
    rendering concern, not a storage one."""
    import struct as _struct

    def decode(raw: bytes) -> tuple[int, int, np.ndarray]:
        if raw[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF payload")
        w, h, flags, _bg, _ar = _struct.unpack_from("<HHBBB", raw, 6)
        pos = 13
        gct = None
        if flags & 0x80:
            ncol = 2 << (flags & 7)
            gct = np.frombuffer(raw, dtype=np.uint8, offset=pos,
                                count=ncol * 3).reshape(ncol, 3)
            pos += ncol * 3
        while pos < len(raw):
            b0 = raw[pos]
            if b0 == 0x3B:
                break
            if b0 == 0x21:            # extension: skip sub-blocks
                pos += 2
                while raw[pos]:
                    pos += 1 + raw[pos]
                pos += 1
                continue
            if b0 != 0x2C:
                raise ValueError(f"unexpected GIF block 0x{b0:02x}")
            _l, _t, iw, ih, iflags = _struct.unpack_from("<HHHHB",
                                                         raw, pos + 1)
            pos += 10
            pal = gct
            if iflags & 0x80:
                ncol = 2 << (iflags & 7)
                pal = np.frombuffer(raw, dtype=np.uint8, offset=pos,
                                    count=ncol * 3).reshape(ncol, 3)
                pos += ncol * 3
            mcs = raw[pos]
            pos += 1
            lzw = bytearray()
            while raw[pos]:
                ln = raw[pos]
                lzw.extend(raw[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), mcs)
            if idx.size != iw * ih:
                raise ValueError("LZW output size mismatch")
            if pal is None:
                raise ValueError("no color table")
            idx2d = idx.reshape(ih, iw)
            if iflags & 0x40:
                # deinterlace: stored row k is image row order[k]
                out = np.empty_like(idx2d)
                out[_gif_interlace_order(ih)] = idx2d
                idx2d = out
            rgb = pal[idx2d].astype(np.int64)
            return iw, ih, rgb
        raise ValueError("no image descriptor in GIF")

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rgb = decode(bytes(payload))
                luma = (30 * rgb[..., 0] + 59 * rgb[..., 1]
                        + 11 * rgb[..., 2])
                # row-position-weighted luma: channel sums and maxima
                # are invariant under row permutation, so only THIS
                # statistic puts the deinterlace path inside the
                # strict gate (a wrong row order changes it)
                ypos = int((luma.sum(axis=1)
                            * np.arange(h, dtype=np.int64)).sum())
                out.append({"media_id": int(mid), "width": int(w),
                            "height": int(h),
                            "sum_r": int(rgb[..., 0].sum()),
                            "sum_g": int(rgb[..., 1].sum()),
                            "sum_b": int(rgb[..., 2].sum()),
                            "max_luma_x100": int(luma.max()),
                            "ypos_luma": ypos})
            yield pd.DataFrame(out)

    return df.mapInPandas(
        per_batch,
        schema="media_id long, width long, height long, sum_r long, "
               "sum_g long, sum_b long, max_luma_x100 long, "
               "ypos_luma long")


def fake_decode_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features — feature j is the
    sum of payload bytes at positions ``k ≡ j (mod dim)`` (a strided
    byte histogram; every value is an integer exactly representable in
    float32). A real deployment replaces this with actual decode +
    model inference; the Spark plumbing (Arrow batches in, fixed-dim
    float vectors out) is identical.
    """
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    out = np.zeros(dim, dtype=np.int64)
    np.add.at(out, np.arange(raw.size) % dim, raw)
    return out.astype(np.float32)


def _unsupported_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding requires PIL/pyav/torchaudio — not present "
        "in this environment; pass decoder=fake_decode_features or a "
        "real decoder")


def extract_features(df: DataFrame, dim: int = 16,
                     decoder: Callable[[bytes, int], np.ndarray]
                     = fake_decode_features) -> DataFrame:
    """(media_id, kind, feature array<float>) via mapInPandas — one
    Arrow batch per call, features vectorized per batch."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(p), dim).tolist()
                     for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feature": feats})

    return df.mapInPandas(
        per_batch, schema="media_id long, kind string, feature array<float>")


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode
    (media_id, frame_idx, ts_ms). The decode itself is the stubbed
    step; the explode is the real distributed work distribution."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.posexplode(F.sequence(
            F.lit(0), (F.col("duration_ms") / every_ms).cast("int")))
        .alias("frame_idx", "ts_s"),
    ).select("media_id", "frame_idx",
             (F.col("frame_idx") * every_ms).alias("ts_ms"))
