"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The Spark-side machinery here is real and tested — schemas, batch
shapes, partition behavior, metadata extraction.  The actual media
decoding (PIL/ffmpeg/torchaudio) is NOT available in this container, so
the decode step is STUBBED: ``decode_stub=True`` yields a deterministic
fake feature vector derived from the bytes; ``decode_stub=False`` raises
``NotImplementedError`` at the point where a real decoder would plug in.

Design for 100 TB of media:
- media bytes stay in ``binary`` columns (parquet keeps them out of
  dictionary encoding; column pruning means metadata-only queries never
  touch the blob pages);
- feature extraction is mapInPandas → Arrow transfers the blobs to
  Python in batches, the UDF yields fixed-width feature arrays;
- ``spark.sql.files.maxPartitionBytes`` (and per-file row-group sizing)
  controls batch memory, not row counts — size for blob width.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: deterministic fake "mime" assignment for fixtures (no real media in
#: the container)
FAKE_MIMES = ["image/png", "audio/wav", "video/mp4"]


def with_media_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: wrap a text column as a binary media column with
    typed metadata, producing the schema a real media table would have:
    (media binary, mime string, n_bytes long)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("media", blob).withColumn(
        "n_bytes", F.octet_length(F.col(text_col)).cast("long")
    ).withColumn(
        "mime",
        F.element_at(
            F.array(*[F.lit(m) for m in FAKE_MIMES]),
            (F.octet_length(F.col(text_col)) % 3 + 1).cast("int"),
        ),
    )


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Media → fixed-width feature vector via Arrow-batched mapInPandas.

    Output schema: (id long, n_bytes long, features array<double>).
    With ``decode_stub`` the "decoder" is a deterministic byte-histogram
    (raw bin counts — integers, so results are exactly reproducible in
    any engine; normalize downstream with ``features[i] / n_bytes`` if a
    unit vector is wanted) — the Spark-side plumbing (batch iteration,
    blob transfer, array output) is identical to a real image/audio
    featurizer.
    """
    import numpy as np
    import pandas as pd

    if not decode_stub:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not present in this "
            "container; plug the decoder in here"
        )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[media_col]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                # deterministic fake decode: byte-value histogram (raw counts)
                hist, _ = np.histogram(arr, bins=feature_dim, range=(0, 256))
                feats.append(hist.astype(float).tolist())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": [len(bytes(b)) for b in pdf[media_col]],
                    "features": feats,
                }
            )

    from mqtt2clickhouse_spark.tables import fan_out

    return fan_out(df.select(id_col, media_col)).mapInPandas(
        featurize, schema="id long, n_bytes long, features array<double>"
    )


def resize_media(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    target_bytes: int = 64,
    decode_stub: bool = True,
) -> DataFrame:
    """Media → resized media (binary → binary), Arrow-batched.

    Real pipeline: decode image → resize → re-encode.  Container has no
    codec libs, so the stub "resize" is a deterministic byte-level
    downsample to ``target_bytes`` (evenly-strided selection) — the
    Spark plumbing (binary in, binary out, width metadata) is identical
    to a real thumbnailer.
    """
    import numpy as np
    import pandas as pd

    if not decode_stub:
        raise NotImplementedError(
            "real image resize requires PIL/ffmpeg; plug the decoder in here"
        )

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[media_col]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                if len(arr) == 0:
                    out.append(b"")
                    continue
                idx = np.linspace(0, len(arr) - 1, min(target_bytes, len(arr)))
                out.append(arr[idx.astype(np.int64)].tobytes())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "media_resized": out,
                    "n_bytes": [len(b) for b in out],
                }
            )

    from mqtt2clickhouse_spark.tables import fan_out

    return fan_out(df.select(id_col, media_col)).mapInPandas(
        do_resize, schema="id long, media_resized binary, n_bytes long"
    )


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    n_frames: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """Video → sampled frames: ONE input row explodes to ``n_frames``
    output rows (id, frame_no, frame binary) — the row-expanding shape a
    real ffmpeg frame sampler has.  Stub: the blob splits into n equal
    chunks standing in for decoded frames.
    """
    import pandas as pd

    if not decode_stub:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg; plug the decoder in here"
        )

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                data = bytes(blob)
                step = max(1, len(data) // n_frames)
                for f in range(n_frames):
                    chunk = data[f * step : (f + 1) * step]
                    if not chunk:
                        break
                    ids.append(rid)
                    frame_nos.append(f)
                    frames.append(chunk)
            yield pd.DataFrame({"id": ids, "frame_no": frame_nos, "frame": frames})

    from mqtt2clickhouse_spark.tables import fan_out

    return fan_out(df.select(id_col, media_col)).mapInPandas(
        do_sample, schema="id long, frame_no int, frame binary"
    )
