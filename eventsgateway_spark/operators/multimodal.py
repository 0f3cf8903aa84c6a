"""Multimodal column plumbing (SURVEY §2.5 Q20 [EXT]).

Images/audio/video ride through the engine as opaque ``BinaryType``
payloads with typed metadata columns; per-asset compute (decode,
resize, feature-extract, frame-sample) runs as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python
row-by-row.

This container has no image/audio libraries, so decode is two-tier:
``stub=False`` REALLY decodes the dependency-free formats — binary
PPM (P6) and PNG images are parsed and resized with numpy + stdlib
zlib, PCM WAV audio with stdlib ``wave`` — and raises
``NotImplementedError`` for formats that need PIL/libav (the plug-in
seam); ``stub=True`` produces deterministic fake features derived
from the payload bytes (stable for tests of the Spark-side plumbing).
Everything Spark-side — schema, batching, partitioning — is real and
tested either way.

Scale notes (100 TB of media): payloads are the wide column; plans
must project them away before any shuffle (decode → drop payload →
aggregate). ``mapInPandas`` keeps the decode pipelined per input
partition — no collect, no per-row Python. Partition count is driven
by input file splits; target ~128 MB of payload per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Asset-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

# Output schema of the decode/feature step.
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Stand-in asset table: document text as an opaque binary payload
    (the schema is what matters — image bytes would slot in as-is)."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _stub_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: dimensions and an 8-dim feature from
    payload bytes. Replaced wholesale by a real decoder; the batch
    shape (pandas in, pandas out, column names = FEATURES_SCHEMA) is
    the contract."""
    out = {
        "asset_id": pdf["asset_id"],
        "media_type": pdf["media_type"],
        "width": [],
        "height": [],
        "n_frames": [],
        "feature": [],
    }
    for raw in pdf["payload"]:
        b = bytes(raw)
        out["width"].append(b[0] % 64 + 1 if b else 0)
        out["height"].append(b[-1] % 64 + 1 if b else 0)
        out["n_frames"].append(len(b) % 30 + 1)
        # 8 byte-histogram-ish floats — deterministic, unit-free
        out["feature"].append(
            [float(sum(b[i::8]) % 997) / 997.0 for i in range(8)] if b else [0.0] * 8
        )
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Real PPM (P6) decode — numpy-only, no external media libraries
# ---------------------------------------------------------------------------


def parse_ppm(b: bytes):
    """Parse a binary PPM (P6): returns (width, height, HxWx3 uint8
    array). Full spec support for whitespace + '#' comments in the
    header; raises ValueError on malformed input."""
    import numpy as np

    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(b[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise ValueError(f"zero-area PPM ({w}x{h})")
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    raw = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
    if raw.size != w * h * 3:
        raise ValueError("PPM payload shorter than header promises")
    return w, h, raw.reshape(h, w, 3)


def encode_ppm(img) -> bytes:
    """HxWx3 uint8 array → binary PPM (P6) bytes."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _ppm_features(b: bytes):
    """8-dim feature from a decoded PPM: normalized dims + per-channel
    means and stdevs — the real-decode analog of the stub's histogram."""
    w, h, img = parse_ppm(b)
    f = img.reshape(-1, 3).astype("float64")
    means = f.mean(axis=0) / 255.0
    stds = f.std(axis=0) / 255.0
    return w, h, [w / 2048.0, h / 2048.0, *means.tolist(), *stds.tolist()]


# ---------------------------------------------------------------------------
# Real PNG decode — stdlib zlib/struct + numpy, no PIL
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_png(b: bytes):
    """Parse a PNG: returns (width, height, HxWxC uint8 array),
    C=3 (RGB, color type 2) or 4 (RGBA, color type 6).

    Real-format support from the stdlib alone: critical-chunk walk
    with CRC verification, zlib inflate, and ALL FIVE scanline filters
    (None/Sub/Up/Average/Paeth — wild PNGs use every one). Limits,
    enforced with ValueError: 8-bit depth, truecolor ±alpha, no
    interlace, no palette — the PIL seam covers the rest."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload (bad magic)")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        # the trailer check covers the CRC too: a payload cut off after
        # a chunk's data would otherwise hand struct.unpack an empty
        # CRC slice and leak struct.error past the ValueError contract
        if len(data) < ln or pos + 12 + ln > len(b):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", b[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        pos += 12 + ln
        if typ == b"IHDR":
            if len(data) != 13:  # spec-fixed size; struct.error is not
                raise ValueError("malformed IHDR chunk")  # our contract
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped, per spec
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if w <= 0 or h <= 0:
        # zero-area "images" would yield NaN feature stats and an
        # IndexError in resize instead of the quarantine path
        raise ValueError(f"zero-area PNG ({w}x{h})")
    if depth != 8 or ctype not in (2, 6):
        raise ValueError(
            f"only 8-bit RGB/RGBA supported (depth={depth}, color_type={ctype})"
        )
    if comp or filt or interlace:
        raise ValueError("unsupported compression/filter/interlace method")
    ch = 3 if ctype == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data shorter than IHDR promises")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        fb = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.uint16)
        if fb == 0:  # None
            rec = line
        elif fb == 1:  # Sub — per-channel cumulative sum mod 256
            rec = (
                line.reshape(w, ch).cumsum(axis=0, dtype=np.uint32) % 256
            ).reshape(stride).astype(np.uint16)
        elif fb == 2:  # Up
            rec = (line + prev) % 256
        # Average/Paeth carry a strict left-neighbor dependency, so the
        # chain can't vectorize — but per-element numpy scalar access
        # is ~10x slower than plain-int loops. Work on bytes (direct
        # int indexing) and a Python list, convert once per scanline.
        elif fb == 3:  # Average — sequential in the left neighbor
            line_b = raw[y * (stride + 1) + 1 : y * (stride + 1) + 1 + stride]
            prev_l = prev.tolist()
            rec_l = [0] * stride
            for i in range(stride):
                left = rec_l[i - ch] if i >= ch else 0
                rec_l[i] = (line_b[i] + ((left + prev_l[i]) >> 1)) & 255
            rec = np.array(rec_l, np.uint16)
        elif fb == 4:  # Paeth — sequential predictor
            line_b = raw[y * (stride + 1) + 1 : y * (stride + 1) + 1 + stride]
            prev_l = prev.tolist()
            rec_l = [0] * stride
            for i in range(stride):
                a = rec_l[i - ch] if i >= ch else 0
                up = prev_l[i]
                c = prev_l[i - ch] if i >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec_l[i] = (line_b[i] + pred) & 255
            rec = np.array(rec_l, np.uint16)
        else:
            raise ValueError(f"unknown PNG filter type {fb}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return w, h, out.reshape(h, w, ch)


def encode_png(img) -> bytes:
    """HxWxC uint8 array (C=3 RGB / C=4 RGBA) → PNG bytes (8-bit,
    filter 0 scanlines, one zlib IDAT)."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = img.shape
    if ch not in (3, 4):
        raise ValueError("encode_png takes HxWx3 (RGB) or HxWx4 (RGBA)")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 6, 0, 0, 0)
    lines = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines.tobytes()))
        + chunk(b"IEND", b"")
    )


def _png_features(b: bytes):
    """Same 8-dim feature contract as _ppm_features; RGBA alpha is
    excluded from the color statistics so RGB and RGBA images of the
    same scene land in the same feature space."""
    w, h, img = parse_png(b)
    f = img.reshape(-1, img.shape[2])[:, :3].astype("float64")
    means = f.mean(axis=0) / 255.0
    stds = f.std(axis=0) / 255.0
    return w, h, [w / 2048.0, h / 2048.0, *means.tolist(), *stds.tolist()]


# ---------------------------------------------------------------------------
# Real WAV (PCM) decode — stdlib wave/struct + numpy, no libav
# ---------------------------------------------------------------------------


def parse_wav(b: bytes):
    """Parse a RIFF/WAVE PCM payload with the stdlib ``wave`` module:
    returns (n_channels, sample_rate, frames x channels float64 array
    normalized to [-1, 1], bits_per_sample). 8/16/32-bit integer PCM;
    raises ``ValueError`` (wave.Error/EOFError re-raised as such) on
    malformed, truncated, or compressed payloads."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(b)) as wf:
            nch, sampwidth = wf.getnchannels(), wf.getsampwidth()
            rate, nframes = wf.getframerate(), wf.getnframes()
            raw = wf.readframes(nframes)
    # EOFError: a payload that STARTS a valid RIFF/WAVE header but
    # truncates mid-chunk escapes wave.Error — same contract violation,
    # same ValueError (callers quarantine on ValueError)
    except (wave.Error, EOFError) as ex:
        raise ValueError(f"not a PCM WAV payload: {ex}") from ex
    if sampwidth == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype("float64")
        x = (x - 128.0) / 128.0
    elif sampwidth == 2:
        x = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(raw, dtype="<i4").astype("float64") / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {sampwidth} bytes")
    if nch <= 0 or x.size % nch:
        raise ValueError("WAV frame data inconsistent with channel count")
    return nch, rate, x.reshape(-1, nch), sampwidth * 8


def encode_wav(samples, rate: int = 16_000) -> bytes:
    """frames x channels float array in [-1, 1] → 16-bit PCM WAV bytes."""
    import io
    import wave

    import numpy as np

    arr = np.asarray(samples, dtype="float64")
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _wav_features(b: bytes):
    """Audio mapping of the FEATURES_SCHEMA contract: width=channels,
    height=bits per sample (as parsed, not assumed), n_frames=PCM
    frame count; 8-dim feature = [rate/48k, duration_s/60, rms, peak,
    zero-crossing rate, channels/8, mean, inter-channel correlation
    (1.0 for mono)]."""
    import numpy as np

    nch, rate, x, bits = parse_wav(b)
    mono = x.mean(axis=1)
    dur = x.shape[0] / rate if rate else 0.0
    rms = float(np.sqrt((mono**2).mean())) if mono.size else 0.0
    peak = float(np.abs(x).max()) if x.size else 0.0
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if mono.size > 1 else 0.0
    if nch >= 2 and x.shape[0] > 1 and x[:, 0].std() > 0 and x[:, 1].std() > 0:
        corr = float(np.corrcoef(x[:, 0], x[:, 1])[0, 1])
    else:
        corr = 1.0
    feat = [rate / 48_000.0, dur / 60.0, rms, peak, zcr, nch / 8.0,
            float(mono.mean()) if mono.size else 0.0, corr]
    return nch, bits, x.shape[0], feat


#: media_type → real decoder, the dependency-free tier. Formats outside
#: this table raise NotImplementedError (the PIL/libav plug-in seam).
#: Image decoders return (w, h, feature); audio returns the 4-tuple
#: (channels, bits, n_frames, feature) — _real_decode_batch handles both.
_REAL_DECODERS = {
    "image/ppm": _ppm_features,
    "image/png": _png_features,
    "audio/wav": _wav_features,
}


def _real_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = {
        "asset_id": pdf["asset_id"],
        "media_type": pdf["media_type"],
        "width": [],
        "height": [],
        "n_frames": [],
        "feature": [],
    }
    for mt, raw in zip(pdf["media_type"], pdf["payload"]):
        dec = _REAL_DECODERS.get(mt)
        if dec is None:
            raise NotImplementedError(
                f"real decode for {mt!r} needs PIL/libav — not available in "
                "this environment; image/ppm, image/png and audio/wav decode "
                "natively (numpy + stdlib zlib/wave)"
            )
        res = dec(bytes(raw))
        if len(res) == 4:  # audio: (channels, bits, n_frames, feature)
            w, h, nf, feat = res
        else:  # image: (w, h, feature), single frame
            (w, h, feat), nf = res, 1
        out["width"].append(w)
        out["height"].append(h)
        out["n_frames"].append(nf)
        out["feature"].append([float(x) for x in feat])
    return pd.DataFrame(out)


def decode_media(assets: DataFrame, stub: bool = True) -> DataFrame:
    """Decode/feature-extract assets via Arrow-batched ``mapInPandas``.

    ``stub=False`` REALLY decodes ``image/ppm`` payloads (numpy-only
    P6 parser — dimensions + per-channel mean/std features) and raises
    ``NotImplementedError`` for formats that need PIL/libav — the
    plug-in seam for a real cluster image."""
    batch = _stub_decode_batch if stub else _real_decode_batch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield batch(pdf)

    from eventsgateway_spark.shipping import ship_package

    ship_package(assets.sparkSession)  # batch fns pickle by module reference
    return assets.mapInPandas(run, FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# resize / frame-sample stubs (same mapInPandas contract as decode)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _nn_resize(img, width: int, height: int):
    """Nearest-neighbor resize of an HxWx3 uint8 array via numpy
    index gather — a real resize, no interpolation libraries."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return img[yi][:, xi]


def resize_media(assets: DataFrame, width: int = 32, height: int = 32, stub: bool = True) -> DataFrame:
    """Thumbnail step. ``stub=False`` REALLY resizes ``image/ppm``
    payloads (numpy nearest-neighbor; thumb re-encoded as PPM) and
    raises for PIL-needing formats; ``stub=True`` emits a
    deterministic byte block (plumbing tests). One output row per
    input row; payload column dropped before any downstream shuffle."""

    def run_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                bytes((b[i % max(len(b), 1)] if len(b) else 0) for i in range(width * height // 256 + 1))
                for b in (bytes(x) for x in pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "thumb": thumbs,
                }
            )

    def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for mt, raw in zip(pdf["media_type"], pdf["payload"]):
                if mt == "image/ppm":
                    _, _, img = parse_ppm(bytes(raw))
                    thumbs.append(encode_ppm(_nn_resize(img, width, height)))
                elif mt == "image/png":
                    _, _, img = parse_png(bytes(raw))
                    thumbs.append(encode_png(_nn_resize(img, width, height)))
                else:
                    raise NotImplementedError(
                        f"real resize for {mt!r} needs PIL — image/ppm and "
                        "image/png resize natively (numpy nearest-neighbor)"
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "thumb": thumbs,
                }
            )

    from eventsgateway_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.mapInPandas(run_stub if stub else run_real, RESIZED_SCHEMA)


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("audio", T.BinaryType()),
    ]
)


def resample_audio(assets: DataFrame, rate: int = 16_000) -> DataFrame:
    """Audio analog of ``resize_media``: nearest-sample resample of
    ``audio/wav`` payloads to a target rate — the numpy index-gather
    device of ``_nn_resize`` applied along time. Real for PCM WAV
    (stdlib wave in, 16-bit WAV out); other audio formats raise — the
    libav plug-in seam. Output payload drops to the new rate's frame
    count; run this BEFORE any shuffle of audio columns (the resample
    usually shrinks 44.1k sources ~3x at 16 kHz)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [],
                "rate": [],
                "n_frames": [],
                "audio": [],
            }
            for aid, mt, raw in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "audio/wav":
                    raise NotImplementedError(
                        f"real resample for {mt!r} needs libav — audio/wav "
                        "resamples natively (stdlib wave + numpy)"
                    )
                nch, src_rate, x, _bits = parse_wav(bytes(raw))
                if x.shape[0] == 0:
                    # header-only WAV is valid input: resampling zero
                    # frames yields zero frames, not an index crash
                    out["asset_id"].append(aid)
                    out["rate"].append(rate)
                    out["n_frames"].append(0)
                    out["audio"].append(encode_wav(x, rate))
                    continue
                n_out = max(1, int(round(x.shape[0] * rate / max(src_rate, 1))))
                idx = np.minimum(
                    (np.arange(n_out) * src_rate // rate), x.shape[0] - 1
                )
                out["asset_id"].append(aid)
                out["rate"].append(rate)
                out["n_frames"].append(n_out)
                out["audio"].append(encode_wav(x[idx], rate))
            yield pd.DataFrame(out)

    from eventsgateway_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.mapInPandas(run, RESAMPLED_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 10, max_frames: int = 3, stub: bool = True) -> DataFrame:
    """Frame-sampling stub (video → k frames): fans each asset out to
    ≤ max_frames rows, one per sampled frame — the row-explosion shape
    a real ffmpeg-based sampler produces. Deterministic: frame bytes
    are fixed slices of the payload."""
    if not stub:
        raise NotImplementedError("real frame sampling needs libav — use stub=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"asset_id": [], "frame_idx": [], "frame": []}
            for aid, raw in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(raw)
                n = min(max_frames, max(1, len(b) // max(every_n, 1)))
                for i in range(n):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(b[i * every_n : (i + 1) * every_n])
            yield pd.DataFrame(rows)

    from eventsgateway_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.mapInPandas(run, FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hashing (round 13 — VERDICT r12 #3: make Q20 feed Q19).
# dHash over the native decode tier: near-duplicate IMAGES (re-encoded,
# resized, lightly-edited copies) collapse to nearby 56-bit signatures
# that the Manku Hamming banding in queries/ext_dedup.py (q63/q89) can
# pair with an equi-join — never all-pairs.
# ---------------------------------------------------------------------------

# dHash grid: resize to 8x8 grayscale, compare each pixel to its right
# neighbor → 8 rows × 7 comparisons = 56 bits. The canonical dHash is
# 9x8 → 64 bits; the 56-bit variant keeps the signature strictly inside
# a SIGNED 64-bit lane so Spark BIGINT and DuckDB BIGINT agree on every
# shift/xor/popcount without sign games (q63's 32-bit precedent).
DHASH_SIDE = 8
DHASH_BITS = DHASH_SIDE * (DHASH_SIDE - 1)  # 56


def dhash56(img) -> int:
    """56-bit difference hash of an HxWxC uint8 image: integer-mean
    grayscale, nearest-neighbor resize to 8x8 (``_nn_resize``'s index
    gather — deterministic integer sampling, no interpolation), then
    bit (y*7+x) = 1 iff gray[y][x] < gray[y][x+1]. Pure integer math:
    byte-identical across hosts.

    Invariance matrix (round 14, all rows test-pinned —
    tests/test_ext.py negative + positive invariance tests):

    - SURVIVES (Hamming 0): integer-factor NN upscale; lossless
      re-encode (PPM↔PNG); uniform brightness shift while NO pixel
      saturates (adjacent comparisons shift together — exact).
    - NOT GUARANTEED (measured 2-8 bits on the fixture family —
      sometimes inside a Hamming-6 bound, sometimes out; do NOT rely
      on either): 1-px crop; brightness shift that saturates.
    - DOES NOT SURVIVE (>6 bits, negative-pinned): rotation (90°),
      horizontal/vertical flip, quarter crop — treat rotated/cropped
      re-posts as distinct assets or canonicalize upstream."""
    import numpy as np

    gray = img.astype(np.int64).sum(axis=2) // img.shape[2]  # HxW int
    g = _nn_resize(gray[:, :, None], DHASH_SIDE, DHASH_SIDE)[:, :, 0]
    bits = (g[:, :-1] < g[:, 1:]).astype(np.int64)  # 8x7
    weights = np.int64(1) << np.arange(DHASH_BITS, dtype=np.int64).reshape(
        DHASH_SIDE, DHASH_SIDE - 1
    )
    return int((bits * weights).sum())


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _gray_grid_batch(imgs, width: int, height: int):
    """(n, height, width) int64 — the dhash law's integer-mean
    grayscale + ``_nn_resize`` index gather over a STACKED (n,H,W,C)
    uint8 batch. One copy of the law shared by the 56-bit and wide
    batch kernels; row-for-row identical to the scalar path (pinned by
    tests/test_ext.py batch-parity tests and, end-to-end, by the q89
    oracle which reproduces every signature from the pixel formula)."""
    import numpy as np

    gray = imgs.astype(np.int64).sum(axis=3) // imgs.shape[3]
    h, w = gray.shape[1], gray.shape[2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return gray[:, yi][:, :, xi]


def _dhash56_batch(imgs):
    """Vectorized :func:`dhash56` over a stacked (n,H,W,C) uint8 batch
    (guide §4.2: cross the Arrow boundary once, NumPy over the whole
    batch — the per-row scalar loop paid ~20 small numpy calls per
    image). Returns (n,) int64."""
    import numpy as np

    g = _gray_grid_batch(imgs, DHASH_SIDE, DHASH_SIDE)
    bits = (g[:, :, :-1] < g[:, :, 1:]).astype(np.int64)
    weights = (np.int64(1) << np.arange(DHASH_BITS, dtype=np.int64)).reshape(
        DHASH_SIDE, DHASH_SIDE - 1
    )
    return (bits * weights).sum(axis=(1, 2))


def _decode_image_batch(pdf: pd.DataFrame):
    """Decode every payload in a batch and return ``[(idx_array,
    (n,H,W,C) uint8 stack), ...]`` grouped by image shape, so the hash
    kernels can vectorize across rows while mixed-dimension batches
    still work (per-shape groups; the fixture corpus is one group)."""
    import numpy as np

    groups: dict = {}
    for i, (mt, raw) in enumerate(zip(pdf["media_type"], pdf["payload"])):
        if mt == "image/ppm":
            _, _, img = parse_ppm(bytes(raw))
        elif mt == "image/png":
            _, _, img = parse_png(bytes(raw))
        else:
            raise NotImplementedError(
                f"perceptual hash for {mt!r} needs PIL — "
                "image/ppm and image/png decode natively"
            )
        groups.setdefault(img.shape, ([], []))
        groups[img.shape][0].append(i)
        groups[img.shape][1].append(img)
    return [
        (np.asarray(idxs, dtype=np.int64), np.stack(imgs))
        for idxs, imgs in groups.values()
    ]


def image_dhash(assets: DataFrame) -> DataFrame:
    """(asset_id, dhash) for an asset frame — REAL decode for the
    native formats (binary PPM / PNG via ``parse_ppm``/``parse_png``),
    ``NotImplementedError`` for formats that need PIL (the plug-in
    seam; no stub tier: a fake perceptual hash would manufacture
    false dedup pairs). Arrow-batched ``mapInPandas``; the payload
    column dies inside the map stage, so only 8-byte signatures ever
    shuffle — the property that makes image dedup 100 TB-viable.
    NULL payloads are EXCLUDED before the map (the zero-norm-vector
    convention: an absent asset never enters a similarity index;
    without the filter ``bytes(None)`` would TypeError mid-batch).
    Hashing runs as ONE vectorized kernel per (batch, image shape)
    group rather than a per-row numpy loop (r16, guide §4.2)."""
    import numpy as np

    assets = assets.filter(F.col("payload").isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for idxs, imgs in _decode_image_batch(pdf):
                out[idxs] = _dhash56_batch(imgs)
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "dhash": out})

    from eventsgateway_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.mapInPandas(run, DHASH_SCHEMA)


# Synthetic image fixture (q89): pixel values are exact integer
# arithmetic on (doc_id, y, x) so the DuckDB oracle reproduces the
# dHash WITHOUT decoding bytes — the Spark side still round-trips
# every pixel through real PPM encode→decode→resize, so the oracle
# pins the whole decode tier bit-for-bit. Near-dup structure: docs
# share a base image in groups of IMG_GROUP consecutive ids; the
# within-group level (doc_id % IMG_GROUP) perturbs a growing ~l/97
# fraction of pixels, so Hamming distance between group-mates rises
# with |level gap| — planted near-dups with a knob, zero randomness.
IMG_GROUP = 10
IMG_SIDE = 16  # full-res side; dHash resizes 16x16 → 8x8 (even coords)
_IMG_P = 65521  # largest prime < 2^16: (s*s+s) mod p mixes base shifts


def _synth_pixel_vals(doc_ids):
    """(n, 16, 16) int64 pixel grid for a doc_id vector — the ONE copy
    of the q89 fixture formula (its DuckDB mirror lives in the q89
    oracle SQL; change both or neither)."""
    import numpy as np

    d = np.asarray(doc_ids, dtype=np.int64).reshape(-1, 1, 1)
    b, lvl = d // IMG_GROUP, d % IMG_GROUP
    Y = np.arange(IMG_SIDE, dtype=np.int64).reshape(1, -1, 1)
    X = np.arange(IMG_SIDE, dtype=np.int64).reshape(1, 1, -1)
    # Perturbation: the level bumps a ~l/41 fraction of the 8x8 dHash
    # grid (the condition is on Y//2, X//2 so each resized pixel's
    # whole 2x2 full-res block moves together) by a PER-PIXEL amount —
    # a constant bump survives the quadratic mix with its ordering
    # intact (measured: flat Hamming ~0-3 across all levels); the
    # (Y*13+X*7)%31 factor decorrelates it (measured gradient 0→~9-12
    # bits across levels 0..9, cross-group ~21-29).
    bump = 977 * (1 + (Y * 13 + X * 7) % 31)
    s = b * 131 + Y * 37 + X * 11 + np.where(
        ((Y // 2) * 31 + (X // 2) * 17) % 41 < lvl, bump, 0
    )
    s %= _IMG_P  # mod BEFORE squaring: s*s stays far from int64 overflow
    return ((s * s + s) % _IMG_P) % 256


def synthetic_doc_images(docs: DataFrame) -> DataFrame:
    """One 16x16 grayscale (r=g=b) binary-PPM asset per document row —
    the deterministic image corpus q89 deduplicates. Emits the
    MEDIA_SCHEMA shape; payloads are REAL P6 bytes built with
    ``encode_ppm`` (the dHash side re-parses them with ``parse_ppm``,
    so the fixture exercises the full binary round-trip)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # header is constant across the fixed-dims corpus and the rgb
        # repeat runs once over the whole batch (r16, guide §4.2): the
        # per-row encode_ppm loop paid an np.repeat + header format per
        # image; bytes are identical (encode_ppm is header + tobytes)
        hdr = b"P6\n%d %d\n255\n" % (IMG_SIDE, IMG_SIDE)
        for pdf in batches:
            vals = _synth_pixel_vals(pdf["doc_id"].to_numpy()).astype(np.uint8)
            flat = np.repeat(vals[:, :, :, None], 3, axis=3).reshape(
                len(pdf), -1
            )
            payloads = [hdr + row.tobytes() for row in flat]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "image/ppm",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    from eventsgateway_spark.shipping import ship_package

    ship_package(docs.sparkSession)
    return docs.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Audio perceptual fingerprint (round 13 — the audio sibling of dHash):
# 56-bit energy-envelope hash over the real PCM WAV decode tier, paired
# by the same Manku Hamming banding (queries/ext_dedup.q90). Catches
# re-encoded / re-amplified / channel-duplicated audio copies.
# ---------------------------------------------------------------------------

AFP_FRAMES = 57  # 57 frame energies -> 56 adjacent comparisons
AFP_FRAME_LEN = 8  # samples per frame
AFP_BITS = AFP_FRAMES - 1  # 56: same signed-64-bit lane as dhash56


def afp56(mono) -> int:
    """56-bit audio fingerprint of a mono float array as produced by
    ``parse_wav`` (exact int-PCM/32768 rationals): rescale to the
    integer PCM lattice, frame into 57×8, per-frame L1 energy
    (Σ|sample| — integer), bit fr = 1 iff e[fr] < e[fr+1]. The
    time-domain analog of the Haitsma-Kalker sign-of-energy-delta
    fingerprint with ONE band, chosen over a spectral version so the
    whole computation is integer-exact (oracle-reproducible).
    Shorter payloads are zero-padded to the 456-sample window; longer
    ones are truncated (a real system hashes fixed windows).

    Invariance matrix (round 14, all rows test-pinned):

    - SURVIVES (Hamming 0): amplitude scaling (energies scale
      together, comparisons unchanged); channel duplication (channel
      0 is hashed); lossless WAV re-encode.
    - DOES NOT SURVIVE (>6 bits at even half-a-frame, negative-
      pinned): TIME SHIFT — the frame grid is absolute, so a
      re-trimmed clip fingerprints differently. A shift-robust tier
      needs overlapping frames or a spectral landmark scheme (both
      non-integer — out of the oracle-reproducible contract);
      align/trim upstream instead."""
    import numpy as np

    q = np.rint(np.asarray(mono, dtype=np.float64) * 32768.0).astype(np.int64)
    n = AFP_FRAMES * AFP_FRAME_LEN
    if q.size < n:
        q = np.pad(q, (0, n - q.size))
    e = np.abs(q[:n]).reshape(AFP_FRAMES, AFP_FRAME_LEN).sum(axis=1)
    bits = (e[:-1] < e[1:]).astype(np.int64)
    weights = np.int64(1) << np.arange(AFP_BITS, dtype=np.int64)
    return int((bits * weights).sum())


AFP_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("afp", T.LongType()),
    ]
)


def _wav_mono_fast(b: bytes):
    """Channel-0 float64 samples of a canonical integer-PCM RIFF/WAVE
    payload via a direct chunk walk — the per-row stdlib
    ``wave.open(BytesIO(...))`` round-trip was the decode tier's cost
    (r16, guide §4.2). Returns ``None`` for anything but the simple
    well-formed layout (non-PCM format tag, odd widths, truncated or
    ragged data): callers fall back to :func:`parse_wav`, which keeps
    the exact legacy behavior AND the legacy error contract for those
    rows. The sample math is the same expression tree as parse_wav's,
    so accepted payloads decode bit-identically on either path."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt = 12, None
    while pos + 8 <= len(b):
        typ = b[pos : pos + 4]
        (ln,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = pos + 8
        if body + ln > len(b):
            return None
        if typ == b"fmt ":
            if ln < 16:
                return None
            afmt, nch, _rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", b[body : body + 16]
            )
            if afmt != 1 or nch <= 0 or bits not in (8, 16, 32):
                return None
            fmt = (nch, bits)
        elif typ == b"data":
            if fmt is None:
                return None
            nch, bits = fmt
            width = bits // 8
            if ln % (nch * width):
                return None
            raw = b[body : body + ln]
            if bits == 8:
                x = np.frombuffer(raw, dtype=np.uint8).astype("float64")
                x = (x - 128.0) / 128.0
            elif bits == 16:
                x = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
            else:
                x = (
                    np.frombuffer(raw, dtype="<i4").astype("float64")
                    / 2147483648.0
                )
            return x[::nch]  # channel 0
        pos = body + ln + (ln & 1)  # chunks are word-aligned
    return None


def _afp56_batch(monos):
    """Vectorized :func:`afp56` over a stacked (n, L) float64 batch of
    SAME-LENGTH mono streams (callers group by length). Same law:
    rescale to the PCM lattice, pad/truncate to the 456-sample window,
    L1 frame energies, adjacent comparisons."""
    import numpy as np

    q = np.rint(np.asarray(monos, dtype=np.float64) * 32768.0).astype(
        np.int64
    )
    n = AFP_FRAMES * AFP_FRAME_LEN
    if q.shape[1] < n:
        q = np.pad(q, ((0, 0), (0, n - q.shape[1])))
    e = np.abs(q[:, :n]).reshape(-1, AFP_FRAMES, AFP_FRAME_LEN).sum(axis=2)
    bits = (e[:, :-1] < e[:, 1:]).astype(np.int64)
    weights = np.int64(1) << np.arange(AFP_BITS, dtype=np.int64)
    return (bits * weights).sum(axis=1)


def _decode_audio_batch(pdf: pd.DataFrame):
    """Decode every WAV payload in a batch and return ``[(idx_array,
    (n, L) float64 mono stack), ...]`` grouped by sample count (the
    image-side ``_decode_image_batch`` discipline)."""
    import numpy as np

    groups: dict = {}
    for i, (mt, raw) in enumerate(zip(pdf["media_type"], pdf["payload"])):
        if mt != "audio/wav":
            raise NotImplementedError(
                f"audio fingerprint for {mt!r} needs libav — "
                "audio/wav decodes natively"
            )
        bb = bytes(raw)
        mono = _wav_mono_fast(bb)
        if mono is None:
            _, _, x, _ = parse_wav(bb)
            mono = x[:, 0]
        groups.setdefault(mono.size, ([], []))
        groups[mono.size][0].append(i)
        groups[mono.size][1].append(mono)
    return [
        (np.asarray(idxs, dtype=np.int64), np.stack(monos))
        for idxs, monos in groups.values()
    ]


def audio_fingerprint(assets: DataFrame) -> DataFrame:
    """(asset_id, afp) — REAL decode for ``audio/wav`` (direct RIFF
    chunk walk with a stdlib-``wave`` fallback for non-canonical
    payloads), ``NotImplementedError`` for formats needing libav (no
    stub tier — a fake fingerprint would manufacture false dedup
    pairs; the image_dhash contract). Arrow-batched ``mapInPandas``;
    payloads die inside the map stage, only 8-byte fingerprints
    shuffle. NULL payloads are excluded before the map (the
    image_dhash / zero-norm convention). Fingerprinting runs as ONE
    vectorized kernel per (batch, length) group (r16, guide §4.2)."""
    import numpy as np

    assets = assets.filter(F.col("payload").isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for idxs, monos in _decode_audio_batch(pdf):
                out[idxs] = _afp56_batch(monos)
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "afp": out})

    from eventsgateway_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.mapInPandas(run, AFP_SCHEMA)


# ---------------------------------------------------------------------------
# Wide perceptual hashes (round 15 — VERDICT r14 #2): the derived-
# geometry tier of queries/ext_dedup.media_geometry_for_rows. Past the
# occupancy-ladder floor the banding needs bands x band_w > 62 bits,
# which no BIGINT lane can hold — the wide signature is a LIST of
# ``bands`` ints, one ``band_w``-bit word per band, consumed by the
# array<bigint> branch of ext_dedup.banded_signatures / hamming_col.
# The hash must also HAVE that many informative bits: each band gets
# its OWN grid row (image) / energy window (audio) of band_w adjacent
# comparisons — the same difference-hash law as dhash56/afp56, scaled.
# At the floor geometry (7, 8) these produce a 7x9-grid / 63-frame
# variant — a DIFFERENT (equally valid) hash family from the fixed
# 56-bit tier; the fixed tier remains the oracle/fixture path, so
# nothing here touches a driver hash.
# ---------------------------------------------------------------------------


def dhash_geom(img, bands: int, band_w: int) -> list:
    """Wide difference hash of an HxWxC uint8 image at an explicit
    Manku geometry: integer-mean grayscale, NN-resize to ``bands`` rows
    x ``band_w + 1`` cols, word b = row b's ``band_w`` adjacent
    comparisons (bit x = 1 iff g[b][x] < g[b][x+1]). Pure integer
    math; same invariance class as :func:`dhash56` (brightness shifts
    without saturation are exact, crops/rotations are not)."""
    import numpy as np

    gray = img.astype(np.int64).sum(axis=2) // img.shape[2]
    g = _nn_resize(gray[:, :, None], band_w + 1, bands)[:, :, 0]
    bits = (g[:, :-1] < g[:, 1:]).astype(np.int64)  # bands x band_w
    weights = np.int64(1) << np.arange(band_w, dtype=np.int64)
    return [int(w) for w in (bits * weights).sum(axis=1)]


def afp_geom(mono, bands: int, band_w: int, frame_len: int = AFP_FRAME_LEN) -> list:
    """Wide audio fingerprint at an explicit geometry: rescale to the
    integer PCM lattice, frame into ``bands x (band_w + 1)`` frames of
    ``frame_len`` samples, word b = the adjacent-energy comparisons
    within band b's own frame window (bands are independent windows,
    so a local edit perturbs few bands — the pigeonhole mass stays
    concentrated). Same amplitude-scaling invariance as afp56."""
    import numpy as np

    frames = bands * (band_w + 1)
    q = np.rint(np.asarray(mono, dtype=np.float64) * 32768.0).astype(np.int64)
    n = frames * frame_len
    if q.size < n:
        q = np.pad(q, (0, n - q.size))
    e = np.abs(q[:n]).reshape(bands, band_w + 1, frame_len).sum(axis=2)
    bits = (e[:, :-1] < e[:, 1:]).astype(np.int64)  # bands x band_w
    weights = np.int64(1) << np.arange(band_w, dtype=np.int64)
    return [int(w) for w in (bits * weights).sum(axis=1)]


def _wide_sig_schema(col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField(col, T.ArrayType(T.LongType())),
        ]
    )


def _dhash_geom_batch(imgs, bands: int, band_w: int):
    """Vectorized :func:`dhash_geom` over a stacked (n,H,W,C) uint8
    batch — returns an (n, bands) int64 word matrix."""
    import numpy as np

    g = _gray_grid_batch(imgs, band_w + 1, bands)
    bits = (g[:, :, :-1] < g[:, :, 1:]).astype(np.int64)
    weights = np.int64(1) << np.arange(band_w, dtype=np.int64)
    return (bits * weights).sum(axis=2)


def _afp_geom_batch(monos, bands: int, band_w: int, frame_len: int = AFP_FRAME_LEN):
    """Vectorized :func:`afp_geom` over a stacked (n, L) float64 batch
    of same-length mono streams — returns (n, bands) int64."""
    import numpy as np

    frames = bands * (band_w + 1)
    q = np.rint(np.asarray(monos, dtype=np.float64) * 32768.0).astype(
        np.int64
    )
    n = frames * frame_len
    if q.shape[1] < n:
        q = np.pad(q, ((0, 0), (0, n - q.shape[1])))
    e = np.abs(q[:, :n]).reshape(-1, bands, band_w + 1, frame_len).sum(axis=3)
    bits = (e[:, :, :-1] < e[:, :, 1:]).astype(np.int64)
    weights = np.int64(1) << np.arange(band_w, dtype=np.int64)
    return (bits * weights).sum(axis=2)


def image_dhash_wide(assets: DataFrame, bands: int, band_w: int) -> DataFrame:
    """(asset_id, dhash: array<bigint>) — :func:`image_dhash` at a
    derived geometry (one word per band). Same decode tier, NULL
    exclusion, signatures-only-shuffle posture, and per-(batch, shape)
    vectorized hashing (r16, guide §4.2)."""
    assets = assets.filter(F.col("payload").isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words: list = [None] * len(pdf)
            for idxs, imgs in _decode_image_batch(pdf):
                for i, row in zip(idxs, _dhash_geom_batch(imgs, bands, band_w).tolist()):
                    words[i] = row
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "dhash": words})

    from eventsgateway_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.mapInPandas(run, _wide_sig_schema("dhash"))


def audio_fingerprint_wide(assets: DataFrame, bands: int, band_w: int) -> DataFrame:
    """(asset_id, afp: array<bigint>) — :func:`audio_fingerprint` at a
    derived geometry (one word per band), vectorized per (batch,
    length) group (r16, guide §4.2)."""
    assets = assets.filter(F.col("payload").isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words: list = [None] * len(pdf)
            for idxs, monos in _decode_audio_batch(pdf):
                for i, row in zip(idxs, _afp_geom_batch(monos, bands, band_w).tolist()):
                    words[i] = row
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "afp": words})

    from eventsgateway_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.mapInPandas(run, _wide_sig_schema("afp"))


def _synth_audio_samples(doc_ids):
    """(n, 456) int64 PCM sample grid (range ±2048) for a doc_id
    vector — the ONE copy of the q90 fixture formula (DuckDB mirror in
    the q90 oracle SQL; change both or neither). Same group/level
    planting as the image fixture: level perturbs ~l/41 of the 57
    FRAMES (whole frames move together, re-randomizing their energy),
    so Hamming distance rises with level gap (measured 0→~11 across
    levels 0..9; cross-group ~29-31)."""
    import numpy as np

    d = np.asarray(doc_ids, dtype=np.int64).reshape(-1, 1)
    b, lvl = d // IMG_GROUP, d % IMG_GROUP
    i = np.arange(AFP_FRAMES * AFP_FRAME_LEN, dtype=np.int64).reshape(1, -1)
    fr = i // AFP_FRAME_LEN
    bump = 977 * (1 + (i * 13) % 31)
    t = (b * 131 + i * 37 + np.where((fr * 31) % 41 < lvl, bump, 0)) % _IMG_P
    return ((t * t + t) % _IMG_P) % 4096 - 2048


def synthetic_doc_audio(docs: DataFrame) -> DataFrame:
    """One 456-sample 16 kHz mono PCM WAV asset per document row — the
    deterministic audio corpus q90 deduplicates. Payloads are REAL
    RIFF/WAVE bytes (``encode_wav``); samples are passed as q/32767
    floats so the int16 lattice round-trips exactly (encode multiplies
    by 32767; parse divides by 2^15, which is exact in float64, so
    ``afp56`` recovers the integers bit-for-bit)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            qs = _synth_audio_samples(pdf["doc_id"].to_numpy())
            payloads = [encode_wav(q / 32767.0, rate=16_000) for q in qs]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    from eventsgateway_spark.shipping import ship_package

    ship_package(docs.sparkSession)
    return docs.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)
