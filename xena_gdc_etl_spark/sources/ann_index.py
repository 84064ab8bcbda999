"""Durable ANN index artifacts: save/load IVF centroids and PQ codebooks.

The workload's session-scoped caches (shared IVF assignment, shared pair
frames) simulate what a deployment does for real: train the quantizers
ONCE, persist them, and let every consumer — batch dedup, ANN serving,
streaming probes, the next day's incremental run — load kilobytes of
state instead of retraining. This module is that persistence seam.

Layout under ``<path>/``:

- ``centroids.parquet``  — (centroid_id bigint, embedding array<float/double>)
- ``codebooks.parquet``  — (subspace int, code int, center array<double>),
  the flattened m×k PQ codebooks
- ``_index.json``        — format version, dims, m/k, row counts; written
  LAST so its presence marks a complete index (same sentinel discipline
  as parquet_sink's ``_manifest.json``)

Both tables are kilobyte-scale (index state, not corpus state), so the
single-file coalesce(1) writes below are deliberate — readers broadcast
them anyway.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_FORMAT_VERSION = 1
_SENTINEL = "_index.json"


def _local_index_paths(path: str, what: str) -> "tuple[str, str]":
    """Resolve ``path`` to (local_fs_path, spark_uri).

    The sentinel half of the index uses local ``open()``/``os`` while the
    tables go through Spark writers/readers — those two halves MUST hit
    the same filesystem. A bare '://' guard isn't enough: a scheme-less
    path resolves against ``fs.defaultFS`` in the JVM (HDFS in a cluster
    deployment) but against the local filesystem in Python, silently
    splitting the index. So: accept plain local paths and ``file://``
    URIs (normalized), hand Spark an EXPLICIT ``file://`` URI so the JVM
    side can never be redirected by ``fs.defaultFS``, and reject every
    other scheme loudly.
    """
    from urllib.parse import urlparse

    parsed = urlparse(path)
    if parsed.scheme == "file":
        if parsed.netloc not in ("", "localhost"):
            raise ValueError(
                f"{what} supports only local file:// URIs, got {path!r}"
            )
        local = parsed.path
    elif parsed.scheme and len(parsed.scheme) > 1:
        # reject on the parsed scheme ALONE: 'hdfs:/nn/idx' (single
        # slash) parses with scheme='hdfs' but contains no '://', and a
        # substring guard would silently treat it as a local relative
        # path. One-letter schemes are Windows drive letters ('C:/...'),
        # which ARE local paths. Deliberate casualty: a relative local
        # path whose FIRST segment contains a colon ('my:dir/idx') is
        # rejected too — fail-loud beats guessing, and './my:dir/idx'
        # parses scheme-less, so the error names that escape hatch.
        raise ValueError(
            f"{what} requires a local path or file:// URI, got {path!r}: "
            "the sentinel is written with local file IO while the tables "
            "go through Spark writers — on a remote filesystem these "
            "would land in different places. For a local relative path "
            "containing ':', prefix it with './'"
        )
    else:
        local = path
    local = os.path.abspath(local)
    return local, "file://" + local


def save_ann_index(
    centroids: DataFrame,
    path: str,
    codebooks: "list[np.ndarray] | None" = None,
    centroid_id: str = "centroid_id",
    vec_col: str = "embedding",
) -> dict:
    """Persist the trained quantizer state; returns the manifest dict.

    ``centroids`` is the (centroid_id, embedding) frame ``ivf_train``
    returns; ``codebooks`` the list of m (k, dsub) arrays ``pq_train``
    returns (optional — an IVF-only index omits the PQ half).

    Crash-consistency contract: the sentinel marks a COMPLETE index, so a
    re-save over an existing index first REMOVES the old sentinel (before
    any parquet write — otherwise a crash mid-overwrite would leave the
    stale sentinel endorsing new/partial tables) and the new manifest is
    written to a temp file and atomically renamed into place. ``path``
    must be a local filesystem path or a local ``file://`` URI: the
    sentinel uses local ``open()``/``os`` while the tables go through
    Spark writers — Spark is handed an explicit ``file://`` URI so that
    ``fs.defaultFS`` (HDFS in a cluster deployment) can never redirect
    the table half away from the sentinel half; remote schemes
    (``hdfs://``, ``s3a://``) are rejected loudly rather than splitting
    the index across filesystems.
    """
    path, spark_uri = _local_index_paths(path, "save_ann_index")
    stale = os.path.join(path, _SENTINEL)
    if os.path.exists(stale):
        os.remove(stale)
    spark = centroids.sparkSession
    cdf = centroids.select(
        F.col(centroid_id).cast("bigint").alias("centroid_id"),
        F.col(vec_col).alias("embedding"),
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(
        spark_uri + "/centroids.parquet"
    )
    n_centroids = cdf.count()
    manifest: dict = {
        "format_version": INDEX_FORMAT_VERSION,
        "n_centroids": int(n_centroids),
        "pq": None,
    }
    if codebooks is not None:
        rows = [
            (int(sub), int(code), [float(x) for x in center])
            for sub, book in enumerate(codebooks)
            for code, center in enumerate(np.asarray(book))
        ]
        bdf = spark.createDataFrame(
            rows, "subspace int, code int, center array<double>"
        )
        bdf.coalesce(1).write.mode("overwrite").parquet(
            spark_uri + "/codebooks.parquet"
        )
        manifest["pq"] = {
            "m": len(codebooks),
            "k": int(np.asarray(codebooks[0]).shape[0]),
            "dsub": int(np.asarray(codebooks[0]).shape[1]),
        }
    tmp = os.path.join(path, _SENTINEL + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, _SENTINEL))
    return manifest


def load_ann_index(
    spark: SparkSession, path: str
) -> "tuple[DataFrame, list[np.ndarray] | None, dict]":
    """Load (centroids frame, codebooks or None, manifest). Fails loudly
    on a missing/incomplete index (no sentinel), a future format, or a
    non-local path (same local-filesystem / file:// contract as save)."""
    path, spark_uri = _local_index_paths(path, "load_ann_index")
    sentinel = os.path.join(path, _SENTINEL)
    if not os.path.exists(sentinel):
        raise FileNotFoundError(
            f"{path} is not a complete ANN index (missing {_SENTINEL}; "
            "a crashed save leaves no sentinel by design)"
        )
    with open(sentinel) as fh:
        manifest = json.load(fh)
    if manifest.get("format_version", 0) > INDEX_FORMAT_VERSION:
        raise ValueError(
            f"ANN index at {path} has format_version "
            f"{manifest['format_version']}; this reader supports "
            f"<= {INDEX_FORMAT_VERSION}"
        )
    centroids = spark.read.parquet(spark_uri + "/centroids.parquet")
    codebooks = None
    if manifest.get("pq"):
        m = manifest["pq"]["m"]
        rows = spark.read.parquet(
            spark_uri + "/codebooks.parquet"
        ).collect()  # bounded: m×k rows of small arrays — index state
        by_sub: dict[int, list] = {}
        for r in rows:
            by_sub.setdefault(r.subspace, []).append((r.code, r.center))
        codebooks = [
            np.array(
                [c for _, c in sorted(by_sub[sub], key=lambda t: t[0])],
                dtype=np.float64,
            )
            for sub in range(m)
        ]
    return centroids, codebooks, manifest
