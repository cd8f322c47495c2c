"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata; SURVEY.md task brief).

Decode branches (resolve_decoder, feature-detected per worker): PIL when
importable (the production path), a dependency-free pure-Python PNG
decoder (`_png_decode` — zlib+struct, 8-bit gray/RGB/RGBA, all five
scanline filters) that proves the REAL-bytes path even in this codec-less
container, and a deterministic fake for non-PNG synthetic payloads. Every
Spark-side piece is real: binary columns, struct metadata, Arrow-batched
mapInPandas with an explicit output schema, and batch-shape-preserving
UDF signatures. Swap in PIL/ffmpeg on a real cluster and nothing changes.

Scale notes: mapInPandas streams Arrow batches (no per-row Python), and
binary payloads never pass through a shuffle here — decode is a narrow
map; downstream aggregates only carry the small extracted features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def attach_fake_binary(
    df: DataFrame, text_col: str = "text", binary_col: str = "payload"
) -> DataFrame:
    """Simulate an image/audio payload column: deterministic bytes derived
    from existing data (stand-in for a real binary column read from
    parquet/webdataset)."""
    return df.withColumn(
        binary_col, F.encode(F.col(text_col), "UTF-8").cast("binary")
    ).withColumn(
        "media_meta",
        F.struct(
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.lit("fake/raw").alias("mime"),
        ),
    )


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", FloatType()),
        StructField("feature_vec", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder. Deterministically expands bytes into a (h, w) uint8
    'image'. A real deployment replaces this with PIL.Image.open /
    torchvision / ffmpeg — the surrounding Arrow plumbing is unchanged.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(arr.size)), 1)
    return np.resize(arr, (side, side))


def _pil_decode(payload: bytes) -> np.ndarray:
    """PIL decoder: any format PIL knows → grayscale uint8 array. Only
    reachable when the worker can import PIL (feature-detected at task
    time); the production path on a real cluster."""
    import io as _io

    from PIL import Image

    with Image.open(_io.BytesIO(payload)) as img:
        return np.asarray(img.convert("L"), dtype=np.uint8)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_decode(payload: bytes) -> np.ndarray:
    """Dependency-free PNG decoder (zlib + struct — both stdlib): 8-bit
    greyscale/RGB/RGBA, non-interlaced, all five scanline filters. Proves
    the REAL-bytes decode path in codec-less containers; anything fancier
    (16-bit, palette, interlace, other formats) belongs to the PIL branch.
    Returns grayscale uint8 via ITU-R 601 luma, matching PIL's convert('L')
    weights."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, b"", None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace}); use the PIL branch"
                )
            meta = (w, h, {0: 1, 2: 3, 6: 4}[color])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, bpp = meta
    raw = zlib.decompress(idat)
    stride = w * bpp
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.intp)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth carry a per-pixel recurrence
            cur = np.zeros(stride, dtype=np.intp)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) >> 1
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                cur[x] = (line[x] + pred) & 0xFF
        img[y] = cur
        prev = cur
    px = img.reshape(h, w, bpp)
    if bpp == 1:
        return px[:, :, 0].copy()
    r, g, b = (px[:, :, i].astype(np.uint32) for i in range(3))
    # PIL's exact convert('L') arithmetic (ImagingConvert L24: 16.16
    # fixed point with round-half-up), so a PIL worker and a pure-Python
    # worker produce bit-identical lumas on a heterogeneous cluster.
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8
    )


def _auto_decode(payload: bytes) -> np.ndarray:
    """Container-independent real-bytes path: PNG magic → the pure-Python
    PNG decoder; anything else → the deterministic stub."""
    if payload[:8] == _PNG_SIG:
        return _png_decode(payload)
    return _fake_decode(payload)


def _strict_auto_decode(payload: bytes) -> np.ndarray:
    """Like _auto_decode but a non-PNG payload FAILS LOUDLY instead of
    silently decoding to the deterministic stub — the write-path (resize/
    re-encode) contract: normalizing a fake decode of a corrupt image into
    the training set is silent data corruption, so stubbing there must be
    an explicit opt-in (mode='fake' or strict=False)."""
    if payload[:8] == _PNG_SIG:
        return _png_decode(payload)
    raise ValueError(
        "non-PNG payload in strict decode: refusing to substitute the "
        "deterministic stub on a write path (pass mode='fake' or "
        "strict=False to opt in)"
    )


def resolve_decoder(mode: str = "auto"):
    """Pick the decode branch: "fake" (stub), "pil" (require PIL), "png"
    (require the builtin PNG decoder), or "auto" — PIL when importable on
    THIS worker, else real-PNG-by-magic-bytes with stub fallback. Called
    inside the UDF so each executor feature-detects its own environment;
    on a capable cluster the stub disappears with no code change."""
    if mode == "fake":
        return _fake_decode
    if mode == "pil":
        return _pil_decode
    if mode == "png":
        return _png_decode
    try:
        import PIL  # noqa: F401

        return _pil_decode
    except ImportError:
        return _auto_decode


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    decode_mode: str = "fake",
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    Output: (doc_id, width, height, mean_luma, feature_vec[8]) — an
    8-bin intensity histogram as the stand-in embedding. decode_mode
    "fake"/"pil"/"auto" selects the decoder per worker (resolve_decoder);
    the fixture payloads are synthetic bytes, so the default stays "fake".
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _decode = resolve_decoder(decode_mode)
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                img = _decode(bytes(payload))
                hist = np.histogram(img, bins=8, range=(0, 256))[0]
                total = max(hist.sum(), 1)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "mean_luma": float(img.mean()),
                        "feature_vec": (hist / total).astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return df.select(id_col, binary_col).mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    every_n: int = 4,
) -> DataFrame:
    """'Video' frame sampling stub: split the payload into fixed-size
    chunks (frames) and keep every n-th — demonstrates the
    one-row-to-many mapInPandas shape used for real frame extraction."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                buf = bytes(payload)
                frame_size = 64
                n_frames = max(len(buf) // frame_size, 1)
                for i in range(0, n_frames, every_n):
                    chunk = buf[i * frame_size : (i + 1) * frame_size]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": int(i),
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return df.select(id_col, binary_col).mapInPandas(batches, schema)


def _png_encode(arr: np.ndarray) -> bytes:
    """Dependency-free 8-bit PNG encoder (zlib + struct), filter 0 on
    every scanline — the inverse of _png_decode. (h, w) arrays encode
    as grayscale (color type 0), (h, w, 3) as RGB (color type 2), so
    both of the decoder's luma paths are round-trippable without PIL
    in the container."""
    import struct
    import zlib

    if arr.ndim == 2:
        h, w, color = arr.shape[0], arr.shape[1], 0
        raw = b"".join(
            b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
        )
    else:
        if arr.ndim != 3 or arr.shape[2] not in (3, 4):
            raise ValueError(
                f"expected (h,w), (h,w,3) or (h,w,4) array, got {arr.shape}"
            )
        h, w, c = arr.shape[0], arr.shape[1], arr.shape[2]
        # color type 2 = RGB (3 bytes/px), 6 = RGBA (4 bytes/px) — the
        # channel count must drive the IHDR or a 4-channel array would
        # silently frame as a corrupt 3-channel PNG (advisor r10)
        color = 2 if c == 3 else 6
        raw = b"".join(
            b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
        )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_encode_gray(arr: np.ndarray) -> bytes:
    """Back-compat alias: 8-bit grayscale encode (resize_images path)."""
    return _png_encode(arr)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("luma_sum", LongType()),
        StructField("luma_hist", ArrayType(LongType())),
    ]
)


def extract_image_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    decode_mode: str = "auto",
    n_bins: int = 8,
) -> DataFrame:
    """Decode + INTEGER-witness stats via Arrow-batched mapInPandas:
    (doc_id, width, height, luma_sum, luma_hist[n_bins] counts).

    The exact-integer sibling of extract_image_features: every output
    is a count or an exact sum of uint8 lumas, so the result is
    bit-deterministic across engines/partitionings — the property the
    q128 driver oracle needs (a float mean/histogram-ratio would drag
    fp-rounding conventions into a decode-correctness check). Same
    narrow-map plan: binary in, small ints out, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _decode = resolve_decoder(decode_mode)
        cols = [f.name for f in IMAGE_STATS_SCHEMA]
        for pdf in it:
            # per-row decode (inherent), then ONE stacked stats pass
            # over the concatenated pixel stream (r16 verdict item 4 —
            # the _dhash_batch §4.2 pattern: the per-row dict/DataFrame
            # assembly, not the arithmetic, dominated this kernel).
            # Batch/scalar bit-parity is pytest-pinned
            # (test_image_stats_batch_matches_scalar).
            imgs = [_decode(bytes(p)) for p in pdf[binary_col]]
            n = len(imgs)
            if n == 0:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            sizes = np.fromiter(
                (im.size for im in imgs), dtype=np.int64, count=n
            )
            flat = np.concatenate(
                [im.reshape(-1) for im in imgs]
            ).astype(np.int64)
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(sizes[:-1], out=starts[1:])
            luma_sum = np.add.reduceat(flat, starts)
            # np.histogram(bins=n_bins, range=(0,256)) semantics:
            # right-open uniform bins, last bin closed at 256
            bin_idx = np.minimum(
                (flat * n_bins) >> 8
                if (256 % n_bins) == 0
                else (flat * n_bins) // 256,
                n_bins - 1,
            )
            row_idx = np.repeat(np.arange(n, dtype=np.int64), sizes)
            hist = np.bincount(
                row_idx * n_bins + bin_idx, minlength=n * n_bins
            ).reshape(n, n_bins)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "width": np.fromiter(
                        (im.shape[1] for im in imgs), np.int32, n
                    ),
                    "height": np.fromiter(
                        (im.shape[0] for im in imgs), np.int32, n
                    ),
                    "luma_sum": luma_sum,
                    "luma_hist": list(hist),
                },
                columns=cols,
            )

    return df.select(id_col, binary_col).mapInPandas(
        batches, IMAGE_STATS_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    mode: str = "auto",
    strict: bool = True,
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, one Arrow batch at
    a time (mapInPandas): the standard image-normalization step of a
    multimodal training pipeline. The plan is a narrow map — binary in,
    binary out, no shuffle — so at 100 TB it runs at scan speed with the
    decoder feature-detected per worker (resolve_decoder). Nearest-
    neighbor sampling is deterministic (index grid via integer centers),
    so every engine/worker produces identical output bytes for the
    grayscale re-encode path.

    strict=True (default): in mode='auto' without PIL, a non-PNG payload
    raises instead of silently resizing the deterministic stub — this is
    a WRITE path, and a stubbed decode leaking into re-encoded training
    data is silent corruption (a fixture regression could otherwise
    change semantics without any test noticing). Pass mode='fake' or
    strict=False to opt in to the stub explicitly."""
    decoder = mode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = resolve_decoder(decoder)
        if strict and decode is _auto_decode:
            decode = _strict_auto_decode
        rows = []
        for pdf in it:
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                img = decode(bytes(payload))
                h, w = img.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = img[ys][:, xs]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(out_w),
                        "height": int(out_h),
                        "payload": _png_encode_gray(resized),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "payload"]
            )
            rows = []

    return df.select(id_col, binary_col).mapInPandas(batches, RESIZED_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sig", LongType()),
    ]
)


def _dhash_of(img: np.ndarray) -> int:
    """64-bit dHash (difference hash — the standard perceptual hash:
    Krawetz 2013 "Kind of Like That"): area-reduce to a 9-wide x 8-tall
    grid, then bit (r, c) = grid[r][c] > grid[r][c+1], row-major.

    The reduction compares block MEANS via the integer cross-multiply
    S_l * N_r > S_r * N_l (block sum x other block's pixel count) — the
    house rational-arithmetic rule — so the hash is bit-deterministic
    on every engine with no float rounding, for ANY dims >= 9x8. Two
    provable invariances the q152 oracle leans on: a constant
    brightness offset shifts every block mean equally (all comparisons
    preserved — dHash is gradient-based by design), and a pixel-
    replication upscale by (sy, sx) scales every block sum by sy*sx
    (order preserved). Returns a SIGNED int64 (two's complement view of
    the 64 bits) so it stores in a Spark long; XOR + bit_count on the
    signed value counts differing bits exactly."""
    h, w = img.shape
    if h < 8 or w < 9:
        raise ValueError(f"dhash needs an image >= 9x8, got {w}x{h}")
    a = img.astype(np.int64)
    rb = (np.arange(8) * h) // 8
    cb = (np.arange(9) * w) // 9
    S = np.add.reduceat(np.add.reduceat(a, rb, axis=0), cb, axis=1)
    rn = np.diff(np.append(rb, h))
    cn = np.diff(np.append(cb, w))
    N = rn[:, None] * cn[None, :]
    bits = (S[:, :8] * N[:, 1:]) > (S[:, 1:] * N[:, :8])
    raw = np.packbits(bits.flatten(), bitorder="little").tobytes()
    u = int.from_bytes(raw, "little")
    return u - (1 << 64) if u >= (1 << 63) else u


def _dhash_batch(imgs: list) -> np.ndarray:
    """Vectorized _dhash_of over a batch of decoded images → int64
    array, bit-identical to the scalar loop (same integer reduceat /
    cross-multiply arithmetic, applied along a stacked axis).

    Why: the scalar hash is ~12 tiny-numpy-call dispatches per image
    (~34 µs on the fixture's 18×16 frames — r16 measurement), which at
    80 k frames/run is numpy CALL overhead, not arithmetic. Images are
    grouped by shape (the reduceat boundaries are shape-dependent) and
    each group hashes as ONE stacked operation; order is restored by
    index."""
    out = np.empty(len(imgs), dtype=np.int64)
    by_shape: dict = {}
    for i, im in enumerate(imgs):
        h, w = im.shape
        if h < 8 or w < 9:
            raise ValueError(f"dhash needs an image >= 9x8, got {w}x{h}")
        by_shape.setdefault((h, w), []).append(i)
    for (h, w), idxs in by_shape.items():
        A = np.stack([imgs[i] for i in idxs]).astype(np.int64)
        rb = (np.arange(8) * h) // 8
        cb = (np.arange(9) * w) // 9
        S = np.add.reduceat(
            np.add.reduceat(A, rb, axis=1), cb, axis=2
        )
        rn = np.diff(np.append(rb, h))
        cn = np.diff(np.append(cb, w))
        N = (rn[:, None] * cn[None, :])[None, :, :]
        bits = (S[:, :, :8] * N[:, :, 1:]) > (S[:, :, 1:] * N[:, :, :8])
        packed = np.packbits(
            bits.reshape(len(idxs), 64), axis=1, bitorder="little"
        )
        out[np.asarray(idxs)] = packed.view("<i8").ravel()
    return out


def dhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    decode_mode: str = "auto",
) -> DataFrame:
    """(doc_id, sig) 64-bit dHash per image payload — decode + hash in
    one Arrow-batched narrow map (binary in, 8 bytes out, no shuffle);
    the image-side analogue of operators/dedup.simhash. Feed the
    result into dedup.banded_hamming_pairs for near-dup candidate
    pairs with the pigeonhole recall guarantee."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = resolve_decoder(decode_mode)
        for pdf in it:
            # decode stays per-row (PNG parse is inherently per-payload);
            # the hash runs once per shape-grouped stack (_dhash_batch)
            imgs = [decode(bytes(p)) for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "sig": _dhash_batch(imgs)
                    if imgs
                    else np.empty(0, dtype=np.int64),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, DHASH_SCHEMA)


# ---------------------------------------------------------------------------
# Audio (round 15 — the task brief's "image/AUDIO/video as opaque
# binary columns"; images had q44/q128/q152, audio had nothing): the
# container has no audio libs, so — exactly as the brief instructs —
# the CODEC end is a deterministic synthetic (int16 little-endian PCM
# generated closed-form from doc_id, the q128/q152 generative-truth
# pattern) while the Spark-side plumbing is REAL: binary payloads,
# Arrow-batched narrow maps, numpy framing/energy, strict
# malformed-payload raises. The fingerprint is the Wang 2003
# (Shazam) idea reduced to its deterministic core: locate energy
# peaks in a framed spectrogram-like representation, fold the peak
# POSITIONS into a compact key.
# ---------------------------------------------------------------------------
AUDIO_FP_SCHEMA = "doc_id long, n_samples long, n_peaks int, fp long"


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    frame_w: int = 128,
    n_frames: int = 64,
) -> DataFrame:
    """(doc_id, n_samples, n_peaks, fp) per int16-LE PCM payload.

    Pipeline per payload (one Arrow-batched narrow map — binary in,
    4 small columns out, no shuffle): decode int16 → frame into
    (n_frames, frame_w) → per-frame energy Σx² (int64-exact: |x| ≤
    2^15 so a frame sum < 2^37) → peaks = frames with energy >
    max/2 (the burst/background separation the synthesizer
    guarantees by construction) → fp = Σ (pos_i + 1)·131^i over the
    ASCENDING peak positions (int64-exact for ≤ 6 peaks). A payload
    whose byte length isn't exactly 2·frame_w·n_frames raises —
    malformed audio must fail loudly, never fingerprint as silence
    (the q128 strict-decode convention)."""
    need = 2 * frame_w * n_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload)
                if len(raw) != need:
                    raise ValueError(
                        f"audio payload for doc {int(doc_id)}: "
                        f"{len(raw)} bytes, expected {need} "
                        f"(int16 × {frame_w}×{n_frames})"
                    )
                x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                frames = x.reshape(n_frames, frame_w)
                energy = (frames * frames).sum(axis=1)
                thresh = energy.max() // 2
                peaks = np.nonzero(energy > thresh)[0]
                fp = 0
                mult = 1
                for p in peaks:  # ascending by construction
                    fp += (int(p) + 1) * mult
                    mult *= 131
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": int(x.size),
                        "n_peaks": int(peaks.size),
                        "fp": fp,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "n_peaks", "fp"]
            )

    return df.select(id_col, binary_col).mapInPandas(
        batches, AUDIO_FP_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video (round 16 — closes the D9 brief's third modality: images have
# q44/q128/q152, audio q161; video had only frame SAMPLING). A video
# here is what it is to a data pipeline: an ordered sequence of frame
# payloads keyed (doc_id, frame_idx) — binary columns with typed
# metadata, exactly the brief's "opaque binary + typed metadata"
# posture. Scene-cut (shot-boundary) detection is the standard
# perceptual-hash formulation (the dHash variant of Zhang 1993's
# pairwise frame differencing): hash every frame, a cut falls where
# consecutive frames' signatures differ by more than tau bits.
# ---------------------------------------------------------------------------
SCENE_SIG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("sig", LongType()),
    ]
)


def scene_cut_flags(
    frames: DataFrame,
    id_col: str = "doc_id",
    frame_col: str = "frame_idx",
    binary_col: str = "payload",
    tau: int = 6,
    decode_mode: str = "auto",
) -> DataFrame:
    """(doc_id, frame_idx, ham, is_cut) per frame: decode + dHash each
    frame payload in ONE Arrow-batched narrow map (binary in, 12 bytes
    out — the q152 codec posture, strict decode: malformed payloads
    raise), then compare CONSECUTIVE frames per video with a lag
    window over (doc_id, frame_idx) — one 8-byte-key hash exchange,
    JVM-side xor+bit_count, no self-join (a frame-to-frame join would
    shuffle the frame table twice and build a hash map per video for
    what is a sort-once sweep). Frame 0 has no predecessor: ham NULL,
    is_cut false. At 100 TB the heavy stage is the embarrassingly
    parallel codec map; the window state is one 8-byte signature per
    running frame."""
    from pyspark.sql.window import Window

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = resolve_decoder(decode_mode)
        for pdf in it:
            # per-row decode, shape-grouped stacked hash (_dhash_batch —
            # r16: the scalar hash was numpy-dispatch-bound at ~34 µs
            # per tiny frame), array-built output frame
            imgs = [decode(bytes(p)) for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "frame_idx": pdf[frame_col].to_numpy(dtype=np.int32),
                    "sig": _dhash_batch(imgs)
                    if imgs
                    else np.empty(0, dtype=np.int64),
                }
            )

    sigs = frames.select(id_col, frame_col, binary_col).mapInPandas(
        batches, SCENE_SIG_SCHEMA
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("sig").over(w)
    ham = F.when(
        prev.isNotNull(),
        F.bit_count(F.col("sig").bitwiseXOR(prev)),
    )
    return sigs.select(
        "doc_id",
        "frame_idx",
        ham.alias("ham"),
        F.coalesce(ham > F.lit(tau), F.lit(False)).alias("is_cut"),
    )
