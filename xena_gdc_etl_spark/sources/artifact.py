"""One shared implementation of the durable-artifact discipline.

Five artifact kinds — ann_index, token_stats, minhash_index,
dedup_state, winnow_index — follow the same crash-consistency and
parameter-tag contract; round 12 shipped the fifth hand-rolled copy of
it, so round 13 factors the contract into one code path (round-12
verdict, "What's missing" #3). The contract:

- the manifest SENTINEL is written LAST, to a temp file renamed into
  place (:func:`endorse`) — its presence always endorses a complete
  artifact, and a crash mid-save leaves no sentinel by design;
- a re-save removes the stale sentinel BEFORE touching tables
  (:func:`begin_save`) so no intermediate state is ever endorsed;
  validate-before-swap savers (dedup_state's stage-then-swap) resolve
  paths first and call :func:`remove_sentinel` only after staging
  validates, shrinking the unendorsed window to the swap itself;
- loads refuse a missing sentinel (:func:`open_manifest`), a
  format_version mismatch (:func:`check_format`), and any parameter-tag
  mismatch (:func:`check_params`) — artifacts built under different
  parameters are different mathematical objects and must never mix.

Paths are local / ``file://`` only: the sentinel uses local file IO
while the tables go through Spark writers, and Spark is handed an
explicit ``file://`` URI so ``fs.defaultFS`` (HDFS in a cluster
deployment) can never redirect the table half away from the sentinel
half; remote schemes are rejected loudly rather than splitting an
artifact across filesystems (:func:`local_artifact_paths`).
"""

from __future__ import annotations

import json
import os


def local_artifact_paths(path: str, what: str) -> "tuple[str, str]":
    """Resolve ``path`` to (local_fs_path, spark_uri).

    The sentinel half of an artifact uses local ``open()``/``os`` while
    the tables go through Spark writers/readers — those two halves MUST
    hit the same filesystem. A bare '://' guard isn't enough: a
    scheme-less path resolves against ``fs.defaultFS`` in the JVM (HDFS
    in a cluster deployment) but against the local filesystem in
    Python, silently splitting the artifact. So: accept plain local
    paths and ``file://`` URIs (normalized), hand Spark an EXPLICIT
    ``file://`` URI so the JVM side can never be redirected by
    ``fs.defaultFS``, and reject every other scheme loudly.
    """
    from urllib.parse import urlparse

    parsed = urlparse(path)
    if parsed.scheme == "file":
        if parsed.netloc not in ("", "localhost"):
            raise ValueError(
                f"{what} supports only local file:// URIs, got {path!r}"
            )
        # strip the scheme+netloc prefix MANUALLY, never via
        # parsed.path: urlparse treats '#'/'?' as fragment/query
        # separators and would silently truncate a directory name
        # containing them (artifact paths are filesystem paths, not
        # URL-encoded — '%20' stays literal by the same rule).
        # Both URI spellings must work: 'file:///x' (netloc form) AND
        # 'file:/x' (the single-slash form Spark itself emits) — a
        # fixed 7-char strip would turn 'file:/tmp/x' into 'mp/x'.
        # Prefix match is case-INSENSITIVE to agree with urlparse's
        # scheme handling ('FILE://host/x' must strip like the
        # lowercase spelling, not fall into the single-slash branch).
        if path[:7].lower() == "file://":
            local = path[len("file://"):]
            if parsed.netloc:
                local = local[len(parsed.netloc):]
        else:
            local = path[len("file:"):]
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


def remove_sentinel(local_path: str, sentinel: str) -> None:
    p = os.path.join(local_path, sentinel)
    if os.path.exists(p):
        os.remove(p)


def begin_save(path: str, sentinel: str, what: str) -> "tuple[str, str]":
    """Standard save prologue: resolve paths and remove any stale
    sentinel — from here until :func:`endorse` the artifact is
    unendorsed, so a crash anywhere in between is detected at load."""
    local, spark_uri = local_artifact_paths(path, what)
    remove_sentinel(local, sentinel)
    return local, spark_uri


def endorse(local_path: str, sentinel: str, manifest: dict) -> dict:
    """Write the manifest sentinel LAST via atomic rename; returns the
    manifest (savers return it to their caller)."""
    tmp = os.path.join(local_path, sentinel + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(local_path, sentinel))
    return manifest


def open_manifest(
    path: str,
    sentinel: str,
    what: str,
    absent_msg: "str | None" = None,
) -> "tuple[str, str, dict]":
    """Load prologue: resolve paths, require the sentinel, parse the
    manifest. Returns (local path, file:// URI, manifest)."""
    local, spark_uri = local_artifact_paths(path, what)
    s = os.path.join(local, sentinel)
    if not os.path.exists(s):
        raise FileNotFoundError(
            absent_msg
            or (
                f"{what}: no {sentinel} under {local!r} — the artifact "
                "is missing or was interrupted mid-save (the sentinel "
                "is written last)"
            )
        )
    with open(s) as fh:
        manifest = json.load(fh)
    return local, spark_uri, manifest


def check_format(
    manifest: dict, version: int, what: str, forward_only: bool = False
) -> None:
    """``forward_only=True`` accepts older formats and refuses newer
    ones (readers that migrate old layouts); the default requires an
    exact match."""
    got = manifest.get("format_version", 0)
    bad = got > version if forward_only else got != version
    if bad:
        rel = f"> supported {version}" if forward_only else f"!= {version}"
        raise ValueError(f"{what}: format_version {got!r} {rel}")


def check_params(
    manifest: dict, expected: dict, what: str, reason: str
) -> None:
    """Refuse a parameter-tag mismatch; ``reason`` states why mixing is
    unsafe for this artifact kind (it is the user-facing explanation,
    so keep it specific)."""
    got = {k: manifest.get(k) for k in expected}
    if got != expected:
        raise ValueError(
            f"{what}: artifact params {got} != expected {expected} — "
            f"{reason}"
        )
