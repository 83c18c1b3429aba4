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


def decode_media(payload: bytes, kind: str) -> dict:
    """Header-only media probe: container format + dimensions / stream
    params via pure-python ``struct`` reads over the leading bytes (no
    codec libraries). Covers PNG, JPEG (SOF marker walk), GIF, BMP
    images and RIFF/WAVE audio.

    Returns ``{"format", "width", "height"}`` for images and
    ``{"format", "channels", "sample_rate"}`` for WAV. Unrecognized
    payloads raise ``ValueError`` (the caller decides whether to null
    out or skip). Full pixel/sample decode still needs codec libraries
    not present in this container — the feature path uses
    :func:`fake_features` as the deterministic stand-in.
    """
    import struct

    b = payload
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])
        return {"format": "png", "width": w, "height": h}
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        # JPEG: walk markers to the first SOFn frame header
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return {"format": "jpeg", "width": w, "height": h}
            i += 2 + seglen
        raise ValueError("jpeg payload without SOF frame header")
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return {"format": "gif", "width": w, "height": h}
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return {"format": "bmp", "width": w, "height": abs(h)}
    if len(b) >= 36 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        channels, rate = struct.unpack("<HI", b[22:28])
        return {"format": "wav", "channels": channels, "sample_rate": rate}
    raise ValueError(f"unrecognized media container for kind={kind!r}")


def media_probe(media: DataFrame) -> DataFrame:
    """mapInPandas header probe over binary payloads →
    (media_id, kind, format, width, height): real struct-parse decode of
    container headers; unrecognized payloads yield null fields (the
    synthetic fixture's text payloads all do — pytest covers crafted
    real headers)."""
    schema = ("media_id long, kind string, format string, "
              "width int, height int")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    m = decode_media(bytes(payload), kind)
                    fmts.append(m["format"])
                    ws.append(m.get("width"))
                    hs.append(m.get("height"))
                except ValueError:
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "format": fmts,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
            })

    return media.mapInPandas(run, schema)


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
