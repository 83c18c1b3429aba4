"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio decode libraries are not available in this environment, so
the decode step is STUBBED (clearly marked); everything Spark-side —
schema, binary columns, partitioning, Arrow batch shapes, the
``mapInPandas`` UDF signatures — is real and tested.

The media table is synthesized deterministically from ``documents``
(text bytes as the opaque payload) so metadata extraction has an exact
DuckDB oracle; the fake feature extractor is deterministic (md5-derived)
and covered by rows-only checks + pytest.
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import md5 as _md5

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def media_table(docs: DataFrame) -> DataFrame:
    """documents → (media_id, kind, payload: binary, meta fields).

    The payload is the utf-8 text bytes — an opaque blob to everything
    downstream, exactly how image/audio bytes would flow.
    """
    kind = F.when(F.col("doc_id") % 3 == 0, "image") \
        .when(F.col("doc_id") % 3 == 1, "audio").otherwise("video")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.col("lang").alias("src_lang"),
    )


def media_meta(media: DataFrame) -> DataFrame:
    """Typed metadata over the opaque payload (JVM-side, no decode)."""
    return media.select(
        "media_id", "kind",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha"),
    )


def decode_media(payload: bytes, kind: str):  # pragma: no cover - stub
    """STUB: real decoders (PIL/libav/opencv) are not in this container.

    The Spark-side plumbing calls :func:`fake_features` instead; swap this
    in when the codec libraries exist.
    """
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries "
        "not present in this environment"
    )


def fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature extractor (md5-seeded, unit-norm)."""
    h = _md5(payload).digest()
    v = np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(np.float64)
    n = float(np.sqrt((v * v).sum())) or 1.0
    return v / n


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas over binary payloads → (media_id, kind, feature array).

    This is the real multimodal hot path shape: Arrow batches of binary
    in, fixed-width float vectors out; decode is stubbed by
    :func:`fake_features`.
    """
    schema = "media_id long, kind string, feature array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(b).tolist() for b in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
            })

    return media.mapInPandas(run, schema)


def extract_features_exploded(media: DataFrame) -> DataFrame:
    """Driver-surface shape of :func:`extract_features`: one row per vector
    component ``(media_id, kind, pos, val)`` — hashable by any canonicalizer
    (array cells are not), and exactly oracle-checkable because the fake
    extractor is md5-derived, which DuckDB computes bit-identically
    (integer byte squares sum exactly; the division is one double op).
    The array-returning API stays for library users.
    """
    feats = extract_features(media)
    return feats.select(
        "media_id", "kind", F.posexplode("feature").alias("pos", "val")
    ).withColumn("val", F.round("val", 6))


def frame_sample(media: DataFrame, every: int = 7, n_frames: int = 4) -> DataFrame:
    """'Frame sampling' plumbing: deterministic byte-offset slices of the
    payload (the video analog: pick frames at fixed strides) — pure
    column ops, one output row per sampled frame."""
    frames = F.sequence(F.lit(0), F.lit(n_frames - 1))
    df = media.withColumn("frame", F.explode(frames))
    off = (F.col("frame") * every) + 1
    return df.select(
        "media_id", "kind", "frame",
        F.sha2(F.expr(f"substr(payload, (frame * {every}) + 1, {every})"), 256)
        .alias("frame_sha"),
        off.alias("offset"),
    )


# ---------------------------------------------------------------- SQL (oracle)


def media_meta_sql() -> str:
    return """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha  -- VARCHAR overload; same utf-8 bytes as the payload
FROM documents
"""


def media_features_sql() -> str:
    """Exact oracle for :func:`extract_features_exploded`: the fake
    extractor is the first ``FEATURE_DIM`` md5 digest bytes, unit-normed —
    reproducible from DuckDB's md5 hex string."""
    return f"""
WITH mfm AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         md5(text) AS h
  FROM documents),
mfb AS (
  SELECT media_id, kind, i AS pos,
         CAST(('0x' || substr(h, i * 2 + 1, 2)) AS INTEGER) AS byte
  FROM mfm, (SELECT unnest(generate_series(0, {FEATURE_DIM - 1})) AS i) ii),
mfn AS (
  SELECT media_id, sqrt(sum(byte * byte)) AS nrm
  FROM mfb GROUP BY media_id)
SELECT mfb.media_id, mfb.kind, mfb.pos,
       round(mfb.byte / (CASE WHEN mfn.nrm = 0 THEN 1.0 ELSE mfn.nrm END), 6)
         AS val
FROM mfb JOIN mfn USING (media_id)
"""
