"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each Python worker processes
whole record batches (never row-at-a-time).

Image DECODE is a real header parse (BMP BITMAPINFOHEADER and binary
PPM/PGM — pure ``struct``/bytes, no image libs needed), fed by a
deterministic BMP synthesizer so the pipeline round-trips real bytes:
writer emits a spec-conformant header, reader parses it back, and the
DuckDB oracle predicts the dims from the generator rule — a bug in
either the writer's or the parser's offsets/endianness breaks the gate.
Image RESIZE is likewise real: nearest-neighbor on the decoded BGR
raster in numpy, re-emitted as a spec-conformant BMP, with the resized
pixel checksum oracle-predicted analytically from the generator rule.
Full-raster codecs (JPEG/ffmpeg/torchaudio) are NOT in this container;
feature-extract and frame-sample keep clearly-marked stand-in kernels
(frame-sample's chunk multiplicity/sizes are still oracle-gated).
The Spark-side contract — schemas, batch iteration, partitioning, UDF
signatures — is real and tested; swapping a real codec in changes one
inner function.

Scale design: binary payloads dominate row size, so operators (a) select
only the columns they touch (column pruning keeps payload scans out of
metadata-only queries), (b) repartition by id before compute-heavy
decode so every core gets work, and (c) emit fixed-size features/frames
so downstream shuffles are payload-free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct carried alongside every payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def attach_metadata(
    df: DataFrame, *, payload_col: str = "payload", media_type: str = "image"
) -> DataFrame:
    """Derive the typed metadata struct from the payload column
    (JVM-side — ``octet_length``, no Python)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("format"),
            F.octet_length(payload_col).cast("long").alias("n_bytes"),
        ),
    )


def bmp_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """Spec-conformant 24-bit uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + 4-byte-aligned BGR raster, deterministic fill)."""
    import struct

    row_len = (width * 3 + 3) & ~3
    pix_size = row_len * height
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + pix_size, 0, 0, off)
    header += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pix_size, 2835, 2835, 0, 0
    )
    row = bytes((seed + x) % 256 for x in range(row_len))
    return header + row * height


def decode_image_header(buf: bytes) -> tuple[int, int, int]:
    """Real image-header decode → (width, height, channels).

    Pure-bytes parsers (no image libraries):

    - **BMP**: little-endian BITMAPINFOHEADER — width int32 @18, height
      int32 @22 (negative = top-down, so abs), bit-depth uint16 @28.
    - **PPM/PGM (binary)**: ``P6``/``P5`` magic, then ASCII width,
      height, maxval tokens with ``#``-comment skipping.

    Anything else raises — decoding other containers (JPEG/PNG…) needs
    codec libraries absent from this environment.
    """
    import struct

    b = bytes(buf)
    if b[:2] == b"BM" and len(b) >= 30:
        width = struct.unpack_from("<i", b, 18)[0]
        height = struct.unpack_from("<i", b, 22)[0]
        bpp = struct.unpack_from("<H", b, 28)[0]
        return width, abs(height), max(bpp // 8, 1)
    if b[:2] in (b"P6", b"P5"):
        toks: list[int] = []
        i = 2
        while len(toks) < 3 and i < len(b):
            c = b[i : i + 1]
            if c == b"#":
                nl = b.find(b"\n", i)
                i = len(b) if nl < 0 else nl + 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < len(b) and not b[j : j + 1].isspace():
                    j += 1
                toks.append(int(b[i:j]))
                i = j
        if len(toks) >= 2:
            return toks[0], toks[1], 3 if b[:2] == b"P6" else 1
    raise ValueError(
        "unsupported image payload (expected BMP or binary PPM/PGM header)"
    )


def synthesize_bmp(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic BMP corpus: one real BMP payload per id, dims
    ``16 + id % 32`` × ``16 + 7·id % 32`` (the rule a SQL oracle can
    restate). Arrow-batched writer — the decode round-trip's other half.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(payload_col, T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bmp_bytes(16 + int(m) % 32, 16 + (int(m) * 7) % 32, int(m))
                for m in pdf[id_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], payload_col: payloads})

    return df.select(id_col).mapInPandas(gen, out_schema)


def decode_images(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode image payloads → (media_id, width, height, channels) by
    parsing the real container header (:func:`decode_image_header`).

    ``mapInPandas``: Arrow record batches in, pandas frames out; the
    decode kernel sees a whole batch of payloads per call.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    sc = df.sparkSession.sparkContext
    return (
        df.select(id_col, payload_col)
        .repartition(sc.defaultParallelism, id_col)
        .mapInPandas(decode, DECODED_IMAGE_SCHEMA)
    )


def extract_features(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Fixed-dim feature vector per payload (STUB kernel: byte-histogram
    folded to FEATURE_DIM floats — a real one runs a vision/audio model
    over the batch)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                total = max(len(arr), 1)
                feats.append((hist / total).astype("float32"))
            yield pd.DataFrame({"media_id": pdf[id_col], "feature": feats})

    sc = df.sparkSession.sparkContext
    return (
        df.select(id_col, payload_col)
        .repartition(sc.defaultParallelism, id_col)
        .mapInPandas(featurize, FEATURE_SCHEMA)
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frame_bytes: int = 256,
    every_nth: int = 4,
) -> DataFrame:
    """Frame sampling for video payloads: split the byte stream into
    fixed-size chunks, keep every Nth (STUB chunking — a real one seeks
    keyframes via the container index). One input row → many frame rows."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                n_frames = max(len(raw) // frame_bytes, 1)
                for i in range(0, n_frames, every_nth):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    sc = df.sparkSession.sparkContext
    return (
        df.select(id_col, payload_col)
        .repartition(sc.defaultParallelism, id_col)
        .mapInPandas(sample, FRAME_SCHEMA)
    )


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("raster_sum", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_bmp(buf: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize on the decoded BMP raster (pure
    numpy on the pixel array — no image libs): parse the header, view
    the 4-byte-aligned BGR rows, index-map pixels, re-emit a
    spec-conformant BMP at (tw, th)."""
    import struct

    import numpy as np

    w, h, ch = decode_image_header(buf)
    if ch != 3:
        raise ValueError("resize_bmp expects 24-bit BMP payloads")
    off = struct.unpack_from("<I", bytes(buf), 10)[0]
    row_len = (w * 3 + 3) & ~3
    raster = np.frombuffer(
        bytes(buf), dtype=np.uint8, count=row_len * h, offset=off
    ).reshape(h, row_len)
    pix = raster[:, : w * 3].reshape(h, w, 3)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    out = pix[ys][:, xs]
    orow = (tw * 3 + 3) & ~3
    pad = orow - tw * 3
    rows = out.reshape(th, tw * 3)
    if pad:
        rows = np.concatenate(
            [rows, np.zeros((th, pad), dtype=np.uint8)], axis=1
        )
    pix_size = orow * th
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + pix_size, 0, 0, offset)
    header += struct.pack(
        "<IiiHHIIiiII", 40, tw, th, 1, 24, 0, pix_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Batch image resize → (media_id, width, height, n_bytes,
    raster_sum, payload): a REAL raster transform (:func:`resize_bmp`),
    with the pixel-byte checksum (padding excluded) emitted so an
    oracle can predict the resized CONTENT analytically, not just the
    dims. Arrow-batched ``mapInPandas``; payload-bearing rows stay
    fixed-size downstream."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_rows = {
                "media_id": [],
                "width": [],
                "height": [],
                "n_bytes": [],
                "raster_sum": [],
                "payload": [],
            }
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                rb = resize_bmp(p, width, height)
                orow = (width * 3 + 3) & ~3
                raster = np.frombuffer(
                    rb, dtype=np.uint8, count=orow * height, offset=54
                ).reshape(height, orow)[:, : width * 3]
                out_rows["media_id"].append(mid)
                out_rows["width"].append(width)
                out_rows["height"].append(height)
                out_rows["n_bytes"].append(len(rb))
                out_rows["raster_sum"].append(int(raster.sum(dtype="int64")))
                out_rows["payload"].append(rb)
            yield pd.DataFrame(out_rows)

    sc = df.sparkSession.sparkContext
    return (
        df.select(id_col, payload_col)
        .repartition(sc.defaultParallelism, id_col)
        .mapInPandas(kernel, RESIZED_IMAGE_SCHEMA)
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.StringType(), True),
        T.StructField("n_gradient_bits", T.LongType(), True),
    ]
)


def dhash_images(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded rasters:
    parse the BMP, nearest-neighbor-sample a 9×8 grayscale grid
    (integer mean of the BGR bytes), emit one bit per horizontal
    gradient (right pixel brighter → 1), 8 bits × 8 rows → a 16-hex
    string — the standard near-duplicate image fingerprint (hamming
    distance ≤ a few bits ⇒ visually identical). Emitted as hex TEXT,
    not a bigint: the 64th bit would overflow a signed long under ANSI
    arithmetic, and hash equality/banding downstream is string work
    anyway (the same banded equi-join infrastructure the text dedup
    family uses then applies per 2-hex band).

    Pure-numpy pixel pipeline (no image libs), Arrow-batched; the gate
    oracle re-derives every bit analytically from the synthetic
    generator's fill rule — a stride/index/rounding bug anywhere in
    writer, parser, sampler, or bit packing flips the value hash.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            ids, hashes, bits_n = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(p)
                w, h, ch = decode_image_header(buf)
                if ch != 3:
                    raise ValueError("dhash_images expects 24-bit BMP")
                off = struct.unpack_from("<I", buf, 10)[0]
                row_len = (w * 3 + 3) & ~3
                raster = np.frombuffer(
                    buf, dtype=np.uint8, count=row_len * h, offset=off
                ).reshape(h, row_len)
                # positive-height BMPs store rows bottom-up: flip to
                # VISUAL order so hash row 0 is the top of the image —
                # interoperable with standard dHash corpora (a
                # storage-order hash is vertically mirrored on any
                # real top-down content)
                if struct.unpack_from("<i", buf, 22)[0] > 0:
                    raster = raster[::-1]
                pix = raster[:, : w * 3].reshape(h, w, 3)
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                gray = pix[ys][:, xs].sum(axis=2, dtype=np.int64) // 3
                bits = gray[:, 1:] > gray[:, :-1]  # (8, 8)
                weights = 1 << (7 - np.arange(8))  # MSB-first per row
                row_bytes = (bits * weights).sum(axis=1)
                ids.append(mid)
                hashes.append("".join(f"{b:02x}" for b in row_bytes))
                bits_n.append(int(bits.sum()))
            yield pd.DataFrame(
                {"media_id": ids, "dhash": hashes, "n_gradient_bits": bits_n}
            )

    sc = df.sparkSession.sparkContext
    return (
        df.select(id_col, payload_col)
        .repartition(sc.defaultParallelism, id_col)
        .mapInPandas(kernel, DHASH_SCHEMA)
    )


#: Integer-DCT scale for pHash: basis entries are round(2^14 · cos),
#: so every downstream product/sum is EXACT int64 arithmetic — no libm
#: cosine ever runs per-row, and the oracle reproduces each coefficient
#: bit-for-bit from the same literal basis (a float DCT would hinge on
#: cross-engine cos()/rounding agreement at bit 52).
PHASH_SCALE = 16384
PHASH_GRID = 32  # sampled raster (PHASH_GRID × PHASH_GRID)
PHASH_OUT = 8  # low-frequency block kept (PHASH_OUT × PHASH_OUT)


def phash_basis(
    n_out: int = PHASH_OUT, n_in: int = PHASH_GRID
) -> list[list[int]]:
    """Integer DCT-II basis matrix: B[u][x] = round(2¹⁴·cos(π(2x+1)u/2N)).

    Computed once driver-side from math.cos and embedded as literals in
    both the kernel (numpy int64 matmul) and the DuckDB oracle — the
    per-row pipeline itself is pure integer arithmetic.
    """
    import math

    return [
        [
            round(PHASH_SCALE * math.cos(math.pi * (2 * x + 1) * u / (2 * n_in)))
            for x in range(n_in)
        ]
        for u in range(n_out)
    ]


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("phash", T.StringType(), True),
        T.StructField("n_bits_set", T.LongType(), True),
    ]
)


def phash_images(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """DCT-based perceptual hash (pHash) over REAL decoded rasters:
    parse the BMP, nearest-neighbor-sample a 32×32 grayscale grid
    (integer BGR mean, visual row order), 2-D integer DCT-II (the
    :func:`phash_basis` matrix on both axes — exact int64 matmuls),
    keep the low-frequency 8×8 block, and emit one bit per coefficient:
    1 iff 2·c exceeds the sum of the 32nd+33rd smallest coefficients
    (the exact-integer form of "above the median of 64" — no half-
    integer median ever materializes). 64 bits pack MSB-first in
    (v, u) row-major order into a 16-hex string, composing with the
    same per-band banded equi-join dedup infrastructure as dHash.

    dHash catches crops/shifts poorly and reacts to any gradient
    flip; pHash is the complementary fingerprint robust to blur,
    rescale, and mild noise (low-frequency spectrum shape). Pure-numpy
    Arrow kernel, no image libs; the gate oracle re-derives every bit
    analytically from the generator fill rule + the same basis
    literals.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        B = np.array(phash_basis(), dtype=np.int64)  # (8, 32)
        weights = 1 << (7 - np.arange(8, dtype=np.int64))  # MSB-first
        g = PHASH_GRID
        for pdf in batches:
            ids, hashes, bits_n = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(p)
                w, h, ch = decode_image_header(buf)
                if ch != 3:
                    raise ValueError("phash_images expects 24-bit BMP")
                off = struct.unpack_from("<I", buf, 10)[0]
                row_len = (w * 3 + 3) & ~3
                raster = np.frombuffer(
                    buf, dtype=np.uint8, count=row_len * h, offset=off
                ).reshape(h, row_len)
                if struct.unpack_from("<i", buf, 22)[0] > 0:
                    raster = raster[::-1]  # visual order (see dhash)
                pix = raster[:, : w * 3].reshape(h, w, 3)
                ys = (np.arange(g) * h) // g
                xs = (np.arange(g) * w) // g
                gray = pix[ys][:, xs].sum(axis=2, dtype=np.int64) // 3
                D = B @ gray @ B.T  # (8, 8) exact int64
                flat = D.ravel()  # (v, u) row-major
                s = np.sort(flat)
                thresh = int(s[31]) + int(s[32])  # 2·median, exact
                bits = (2 * flat > thresh).reshape(8, 8)
                row_bytes = (bits * weights).sum(axis=1)
                ids.append(mid)
                hashes.append("".join(f"{b:02x}" for b in row_bytes))
                bits_n.append(int(bits.sum()))
            yield pd.DataFrame(
                {"media_id": ids, "phash": hashes, "n_bits_set": bits_n}
            )

    sc = df.sparkSession.sparkContext
    return (
        df.select(id_col, payload_col)
        .repartition(sc.defaultParallelism, id_col)
        .mapInPandas(kernel, PHASH_SCHEMA)
    )


def wav_bytes(n_samples: int, rate: int, seed: int = 0) -> bytes:
    """Spec-conformant PCM-16 mono RIFF/WAVE payload with a
    deterministic integer sample rule a SQL oracle can restate:
    ``s_i = ((seed·31 + i·17) mod 2003) − 1001``."""
    import struct

    samples = [
        ((seed * 31 + i * 17) % 2003) - 1001 for i in range(n_samples)
    ]
    data = b"".join(struct.pack("<h", s) for s in samples)
    byte_rate = rate * 2  # mono, 16-bit
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav_header(buf: bytes) -> tuple[int, int, int, int, int]:
    """Parse a RIFF/WAVE PCM payload's ACTUAL bytes → (sample_rate,
    n_channels, bits_per_sample, n_samples, data_offset). Pure struct
    — no audio libs in this container; full codecs (mp3/flac) would
    slot in here."""
    import struct

    if buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    # walk chunks: fmt_ then data (robust to extra chunks)
    pos, rate, nch, bits, n_samples, data_off = 12, None, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (sz,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        if cid == b"fmt ":
            _fmt, nch, rate, _br, _block, bits = struct.unpack(
                "<HHIIHH", buf[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            if bits is None:
                raise ValueError("data chunk before fmt")
            n_samples = sz // (max(nch, 1) * (bits // 8))
            data_off = pos + 8
        pos += 8 + sz + (sz % 2)
    if rate is None or n_samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, nch, bits, n_samples, data_off


def synthesize_wav(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic WAV corpus: one real PCM-16 payload per id,
    ``n_samples = 64 + id % 128``, ``rate = 8000 + 4000·(id % 4)`` —
    rules a SQL oracle can restate. The audio twin of
    :func:`synthesize_bmp`."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(payload_col, T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                wav_bytes(
                    64 + int(m) % 128,
                    8000 + 4000 * (int(m) % 4),
                    int(m),
                )
                for m in pdf[id_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], payload_col: payloads})

    return df.select(id_col).mapInPandas(gen, out_schema)


def decode_audio(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode audio payloads → (media_id, sample_rate, n_channels,
    bits, n_samples, peak_abs, sum_sq) by parsing the REAL RIFF bytes
    and folding the PCM samples in exact int64 (peak |s|, Σs² — the
    loudness/clipping signals; no float RMS so the oracle compares
    exact integers). Arrow-batched ``mapInPandas``, payload column
    pruned everywhere else."""
    import struct

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("sample_rate", T.LongType(), True),
            T.StructField("n_channels", T.LongType(), True),
            T.StructField("bits", T.LongType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("peak_abs", T.LongType(), True),
            T.StructField("sum_sq", T.LongType(), True),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                rate, nch, bits, n, off = decode_wav_header(buf)
                data = buf[off : off + n * nch * (bits // 8)]
                samples = struct.unpack(f"<{n * nch}h", data)
                rows.append(
                    (
                        int(mid),
                        rate,
                        nch,
                        bits,
                        n,
                        max((abs(s) for s in samples), default=0),
                        sum(s * s for s in samples),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "bits",
                    "n_samples",
                    "peak_abs",
                    "sum_sq",
                ],
            )

    return df.mapInPandas(decode, out_schema)


def phash_pairs_banded(
    hashes: DataFrame,
    *,
    max_hamming: int = 7,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate IMAGE pairs from perceptual hashes — the pairing
    half the dHash/pHash docstrings promise: pigeonhole banding over
    the 16-hex (64-bit) hash, then exact hamming verify. Split into
    ``max_hamming + 1`` blocks (default 8 blocks × 2 hex chars = 8
    bits), two hashes within ``max_hamming`` MUST agree on at least
    one whole block, so an equi-join on (block_idx, block_value) finds
    every true pair — the same pigeonhole discipline as
    ``simhash_pairs_banded``, never hash×hash.

    The verify is exact integer bit work: each hash splits into two
    32-bit halves (hex→int is sign-safe in int64), hamming =
    Σ bit_count(xor(half_a, half_b)) — bit-identical in DuckDB.

    Scale shape: band explode is ×(max_hamming+1) rows; the band
    equi-join is the only shuffle and near-identical images collapse
    into shared buckets (hot buckets = real duplicate clusters —
    output-bound, the LSH-family contract). Output: (id_a, id_b,
    hamming) with hamming ≤ max_hamming.
    """
    bands = max_hamming + 1
    assert 16 % bands == 0, "bands must evenly split 16 hex chars"
    width = 16 // bands
    band_arr = F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" i -> substring({hash_col}, {width} * i + 1, {width}))"
    )
    rows = hashes.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_ph"),
        F.posexplode(band_arr).alias("band", "sig"),
    )
    a = rows.select(
        F.col("_id").alias("id_a"), F.col("_ph").alias("_ph_a"), "band", "sig"
    )
    b = rows.select(
        F.col("_id").alias("id_b"), F.col("_ph").alias("_ph_b"), "band", "sig"
    )
    half = "cast(conv(substring({c}, {off}, 8), 16, 10) as bigint)"
    ham = (
        f"bit_count({half.format(c='_ph_a', off=1)}"
        f" ^ {half.format(c='_ph_b', off=1)})"
        f" + bit_count({half.format(c='_ph_a', off=9)}"
        f" ^ {half.format(c='_ph_b', off=9)})"
    )
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ph_a", "_ph_b")
        .distinct()  # a pair may agree on several bands
        .withColumn("hamming", F.expr(ham))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def scene_cuts(
    frames: DataFrame,
    *,
    media_col: str = "media_id",
    idx_col: str = "frame_idx",
    payload_col: str = "payload",
    threshold: int = 8,
    keep_first: bool = False,
) -> DataFrame:
    """Video scene-cut detection from perceptual frame fingerprints:
    dHash every frame (the REAL raster kernel — parse, sample, gradient
    bits), then flag consecutive-frame pairs whose Hamming distance
    exceeds ``threshold`` — the shot-boundary signal a video training
    pipeline uses to pick one representative frame per shot instead of
    near-identical neighbors.

    Shape at 100 TB: the per-frame hash is one Arrow kernel pass
    (embarrassingly parallel); the temporal comparison is ONE ``lag``
    window partitioned by media and ordered by frame index — reducer
    width is a single video's frame count, never the corpus. Hamming
    is the exact integer 32-bit-half form shared with
    :func:`phash_pairs_banded`, bit-identical in DuckDB.

    Output: (media_id, frame_idx, hamming, is_cut) for every frame
    with a predecessor (frame 0 has none). With ``keep_first=True``
    the predecessor-less first frames stay in the output with
    ``hamming`` NULL and ``is_cut`` false — the full-roster form
    :func:`shot_representatives` consumes, so the (expensive) decode
    pipeline under ``frames`` is referenced exactly once instead of
    re-running for a separate roster branch. Frame indexes are packed
    with the media id into the hash kernel's single long id and
    unpacked after — so ``frame_idx`` MUST lie in [0, 4096) and
    ``media_id`` must be a non-negative integral: anything else would
    silently corrupt the unpacked pair and mis-pair frames. The pack
    expression guards with ``raise_error`` (checked in-expression on
    the executors — no extra validation pass, raise-don't-return-
    plausible), so a violating row fails the job loudly.
    """
    pack = (
        f"CASE WHEN {idx_col} IS NULL OR {idx_col} < 0"
        f" OR {idx_col} >= 4096"
        f" OR cast({idx_col} as bigint) != {idx_col} THEN"
        f" raise_error(concat('scene_cuts: frame_idx not an integer"
        f" in [0, 4096): ',"
        f" coalesce(cast({idx_col} as string), 'NULL')))"
        f" WHEN {media_col} IS NULL OR {media_col} < 0"
        f" OR cast({media_col} as bigint) IS NULL"
        f" OR cast({media_col} as bigint) != {media_col} THEN"
        f" raise_error(concat('scene_cuts: media id not a non-negative"
        f" integer: ', coalesce(cast({media_col} as string), 'NULL')))"
        f" ELSE cast({media_col} as bigint) * 4096"
        f" + cast({idx_col} as bigint) END"
    )
    fid = frames.select(
        F.expr(pack).alias("media_id"),
        F.col(payload_col).alias("payload"),
    )
    hashed = dhash_images(fid).select(
        F.expr("media_id div 4096").alias(media_col),
        F.expr("media_id % 4096").alias(idx_col),
        "dhash",
    )
    w = Window.partitionBy(media_col).orderBy(idx_col)
    half = "cast(conv(substring({c}, {off}, 8), 16, 10) as bigint)"
    ham = (
        f"bit_count({half.format(c='_prev', off=1)}"
        f" ^ {half.format(c='dhash', off=1)})"
        f" + bit_count({half.format(c='_prev', off=9)}"
        f" ^ {half.format(c='dhash', off=9)})"
    )
    lagged = hashed.withColumn("_prev", F.lag("dhash").over(w))
    if not keep_first:
        lagged = lagged.filter(F.col("_prev").isNotNull())
    is_cut = F.col("hamming") > threshold
    if keep_first:
        # first frames carry a NULL hamming; they open a shot, they
        # are not a cut
        is_cut = F.coalesce(is_cut, F.lit(False))
    return lagged.withColumn("hamming", F.expr(ham)).select(
        media_col,
        idx_col,
        "hamming",
        is_cut.alias("is_cut"),
    )


def shot_representatives(
    frames: DataFrame,
    *,
    media_col: str = "media_id",
    idx_col: str = "frame_idx",
    payload_col: str = "payload",
    threshold: int = 8,
) -> DataFrame:
    """Representative-frame selection — the step AFTER
    :func:`scene_cuts`: number each video's shots by the running count
    of detected cuts and keep one representative (the shot's first
    frame) plus the shot length — the "one frame per shot instead of
    30 near-identical neighbors" reduction a video training pipeline
    feeds to the expensive vision encoder.

    Composition: the scene-cut lag window in its full-roster form
    (``keep_first=True`` — first frames ride along with ``is_cut``
    false, so the expensive decode pipeline under ``frames`` is
    referenced exactly ONCE; the former roster reconstruction via
    anti-join + union re-ran the hash kernel per branch — 3 decode
    passes and 0 reused exchanges in the r15 plan), a second
    running-sum window on the SAME (media, frame) partitioning —
    Spark reuses the sort — and one grouped min/count. Reducer width
    stays a single video's frames throughout.

    Output: (media_id, shot_idx ≥ 0, rep_frame_idx, n_frames).
    """
    numbered = (
        scene_cuts(
            frames,
            media_col=media_col,
            idx_col=idx_col,
            payload_col=payload_col,
            threshold=threshold,
            keep_first=True,
        )
        .select(
            media_col, idx_col, F.col("is_cut").cast("long").alias("_cut")
        )
        .withColumn(
            "shot_idx",
            F.sum("_cut").over(
                Window.partitionBy(media_col)
                .orderBy(idx_col)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        numbered.groupBy(media_col, "shot_idx")
        .agg(
            F.min(idx_col).alias("rep_frame_idx"),
            F.count(F.lit(1)).alias("n_frames"),
        )
    )
