"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Convention: media rides in an opaque `binary` column next to a typed
metadata struct — the lakehouse-standard layout. Everything that can be
computed from raw bytes IS computed for real (size, hashes, magic-byte
container sniffing, byte histograms/entropy); the codec-dependent steps
(pixel decode, resample, resize) are STUBBED behind
``NotImplementedError`` or a clearly-marked deterministic fake, because
image/audio codecs are not available in this environment. The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested, so dropping in a real
decoder is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# metadata struct convention for media columns
MEDIA_META_SCHEMA = (
    "mime string, n_bytes long, content_hash long, "
    "width int, height int, duration_ms int"
)

# container magic numbers (hex of leading bytes → mime)
_MAGIC = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),     # RIFF (also webp/avi — refined below)
    ("494433", "audio/mpeg"),      # ID3
    ("664C6143", "audio/flac"),
    ("1A45DFA3", "video/webm"),
]


def sniff_mime(binary_col) -> Column:
    """Container type from magic bytes — pure JVM (hex prefix compare)."""
    b = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    head = F.hex(F.expr(f"substring({binary_col}, 1, 8)")) if isinstance(binary_col, str) \
        else F.hex(b.substr(1, 8))
    out = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        out = F.when(head.startswith(magic), F.lit(mime)).otherwise(out)
    return out


def blob_stats(binary_col) -> Column:
    """struct(n_bytes, content_hash, mime) — scan-side, no Python."""
    b = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    return F.struct(
        F.length(b).cast("long").alias("n_bytes"),
        F.xxhash64(b).alias("content_hash"),
        sniff_mime(binary_col).alias("mime"),
    )


def byte_histogram(df: DataFrame, binary_col: str,
                   out_name: str = "byte_hist") -> DataFrame:
    """256-bin normalized byte histogram per blob — a REAL codec-free
    content feature (spam/encrypted/corrupt detection, near-dup on raw
    bytes). Arrow-batched numpy over mapInPandas; output adds
    array<double>[256]."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    # copy — StructType.add mutates the DataFrame's cached schema in place
    schema = StructType(df.schema.fields
                        + [StructField(out_name, ArrayType(DoubleType()))])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hists = []
            for blob in pdf[binary_col]:
                if blob is None or len(blob) == 0:
                    hists.append([0.0] * 256)
                    continue
                arr = np.frombuffer(blob, dtype=np.uint8)
                h = np.bincount(arr, minlength=256).astype("float64") / arr.size
                hists.append(h.tolist())
            pdf = pdf.copy()
            pdf[out_name] = hists
            yield pdf

    return df.mapInPandas(_batches, schema)


def byte_entropy(df: DataFrame, binary_col: str,
                 out_name: str = "byte_entropy") -> DataFrame:
    """Shannon entropy of the byte distribution (bits/byte): ~8 for
    compressed/encrypted payloads, lower for structured data."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(df.schema.fields + [StructField(out_name, DoubleType())])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ents = []
            for blob in pdf[binary_col]:
                if blob is None or len(blob) == 0:
                    ents.append(float("nan"))
                    continue
                arr = np.frombuffer(blob, dtype=np.uint8)
                p = np.bincount(arr, minlength=256) / arr.size
                nz = p[p > 0]
                ents.append(float(-(nz * np.log2(nz)).sum()))
            pdf = pdf.copy()
            pdf[out_name] = ents
            yield pdf

    return df.mapInPandas(_batches, schema)


# ------------------------------------------------------- codec-bound (STUBS)

DECODED_IMAGE_SCHEMA = "height int, width int, channels int, pixels binary"


def _pil():
    """Codec seam: the real decoder when Pillow is installed, else None.
    Resolved at CALL time on the worker so shipping the package into the
    cluster environment upgrades decode_image from fake to real with no
    code change."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


def decode_image(df: DataFrame, binary_col: str, *, fake: bool = False,
                 out_name: str = "decoded") -> DataFrame:
    """Decode image bytes to (height, width, channels, raw pixels).

    Uses Pillow when importable (the codec seam, ``_pil``). Without a
    codec: ``fake=True`` fills the struct with a DETERMINISTIC stand-in
    (dims derived from blob length and first/last byte — reproducible
    across engines and runs, so the plumbing is oracle-checkable);
    otherwise raises NotImplementedError.
    """
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        df.schema.fields
        + [StructField(out_name, StructType.fromDDL(DECODED_IMAGE_SCHEMA))])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _pil()
        for pdf in it:
            if Image is None and not fake:
                raise NotImplementedError(
                    "decode_image: no image codec in this environment — "
                    "install Pillow, or pass fake=True for plumbing tests"
                )
            out = []
            for blob in pdf[binary_col]:
                if blob is None or len(blob) == 0:
                    out.append(None)
                elif Image is not None and not fake:
                    img = Image.open(io.BytesIO(bytes(blob)))
                    out.append({"height": img.height, "width": img.width,
                                "channels": len(img.getbands()),
                                "pixels": img.tobytes()})
                else:
                    b = bytes(blob)
                    n = len(b)
                    out.append({"height": 1 + (n + b[0]) % 64,
                                "width": 1 + (7 * n + b[-1]) % 64,
                                "channels": 3, "pixels": bytes(3)})
            pdf = pdf.copy()
            pdf[out_name] = out
            yield pdf

    return df.mapInPandas(_batches, schema)


def frame_sample_indices(duration_ms, fps: float = 1.0,
                         max_frames: int = 16) -> Column:
    """Frame indices to sample from a video of given duration — REAL
    arithmetic (uniform stride capped at max_frames); the decode of the
    chosen frames is codec-bound and stubbed in `decode_image`."""
    d = F.col(duration_ms) if isinstance(duration_ms, str) else duration_ms
    n = F.least(F.greatest((d / F.lit(1000.0) * fps).cast("int"), F.lit(1)),
                F.lit(max_frames))
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: (i * d / n).cast("int"),
    )


def resize_image(df: DataFrame, decoded_col: str, width: int, height: int,
                 *, method: str = "nearest",
                 out_name: str = "resized") -> DataFrame:
    """Resize decoded images to (width, height).

    Resampling over an already-DECODED pixel buffer needs no codec:
    ``method="nearest"`` is pure numpy index math over the
    (height, width, channels) array — deterministic, oracle-checkable,
    works in this environment for real. ``method="bilinear"`` routes
    through the Pillow seam (``_pil``) for filtered resampling and
    raises when no codec ships with the cluster env. Buffers whose
    length disagrees with height*width*channels (e.g. the deterministic
    fake from ``decode_image(fake=True)``) are zero-padded/truncated
    first, so the plumbing stays testable end-to-end. Output adds a
    ``DECODED_IMAGE_SCHEMA`` struct column ``out_name``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resize method {method!r}")
    schema = StructType(
        df.schema.fields
        + [StructField(out_name, StructType.fromDDL(DECODED_IMAGE_SCHEMA))])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()
        if method == "bilinear" and Image is None:
            raise NotImplementedError(
                "resize_image(method='bilinear') needs Pillow; "
                "method='nearest' is codec-free")
        for pdf in it:
            out = []
            for dec in pdf[decoded_col]:
                if dec is None:
                    out.append(None)
                    continue
                h, w, c = int(dec["height"]), int(dec["width"]), \
                    int(dec["channels"])
                buf = np.frombuffer(bytes(dec["pixels"]), dtype=np.uint8)
                need = h * w * c
                if buf.size != need:           # tolerate fake/corrupt blobs
                    buf = np.resize(np.pad(buf, (0, max(0, need - buf.size))),
                                    need)
                px = buf.reshape(h, w, c)
                if method == "bilinear":
                    img = Image.frombytes(
                        {1: "L", 3: "RGB", 4: "RGBA"}[c], (w, h),
                        px.tobytes())
                    rs = np.asarray(img.resize((width, height),
                                               Image.BILINEAR))
                    rs = rs.reshape(height, width, c)
                else:
                    # nearest neighbor: src = floor((dst + 0.5) * src/dst)
                    ri = np.minimum(
                        ((np.arange(height) + 0.5) * h / height)
                        .astype(np.int64), h - 1)
                    ci = np.minimum(
                        ((np.arange(width) + 0.5) * w / width)
                        .astype(np.int64), w - 1)
                    rs = px[ri[:, None], ci[None, :], :]
                out.append({"height": height, "width": width,
                            "channels": c,
                            "pixels": rs.astype(np.uint8).tobytes()})
            pdf = pdf.copy()
            pdf[out_name] = out
            yield pdf

    return df.mapInPandas(_batches, schema)


IMAGE_FEATURES_SCHEMA = (
    "aspect_ratio double, brightness double, contrast double, "
    "channel_means array<double>, channel_stds array<double>"
)


def image_features(df: DataFrame, decoded_col: str,
                   out_name: str = "img_features") -> DataFrame:
    """Pixel-level feature extraction over DECODED images — REAL and
    codec-free (pure numpy over the pixel buffer, same pad/truncate
    contract as resize_image): aspect ratio, global brightness (mean
    luminance), contrast (luminance std), per-channel means and stds.
    The standard cheap features a multimodal curation pipeline filters
    on (drop all-black/all-white frames, extreme aspect ratios) before
    paying for model inference.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        df.schema.fields
        + [StructField(out_name, StructType.fromDDL(IMAGE_FEATURES_SCHEMA))])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for dec in pdf[decoded_col]:
                if dec is None:
                    out.append(None)
                    continue
                h, w, c = int(dec["height"]), int(dec["width"]), \
                    int(dec["channels"])
                buf = np.frombuffer(bytes(dec["pixels"]), dtype=np.uint8)
                need = h * w * c
                if buf.size != need:
                    buf = np.resize(np.pad(buf, (0, max(0, need - buf.size))),
                                    need)
                px = buf.reshape(h * w, c).astype(np.float64)
                lum = px.mean(1)
                out.append({
                    "aspect_ratio": w / h,
                    "brightness": float(lum.mean()),
                    "contrast": float(lum.std()),
                    "channel_means": [float(m) for m in px.mean(0)],
                    "channel_stds": [float(s) for s in px.std(0)],
                })
            pdf = pdf.copy()
            pdf[out_name] = out
            yield pdf

    return df.mapInPandas(_batches, schema)
