"""GDC API request construction — the query surface of the reference's
``gdc.search``/``gdc.download`` (/root/reference/xena_gdc_etl/gdc.py:221,
:360), split the Spark way: building the request payload is pure, testable
logic here; actually fetching runs on executors via ``fetch_table`` so a
million-file manifest downloads in parallel, not in a driver loop.

Endpoints and payload grammar are the public GDC API
(https://api.gdc.cancer.gov, docs.gdc.cancer.gov). No network is touched
unless ``fetch_table`` is called.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from xena_gdc_etl_spark.filters import FilterSpec

GDC_API_BASE = "https://api.gdc.cancer.gov"
VALID_ENDPOINTS = ("files", "cases", "projects", "annotations")


def _csv_param(value: "Sequence[str] | str") -> str:
    """The reference accepts fields/expand as a list, a comma-separated
    string, or a mix (gdc.py:276-279 isinstance-str promotion); normalize
    to the comma-joined request form either way. A bare string must NOT
    be iterated char-by-char."""
    if isinstance(value, str):
        return value
    return ",".join(value)


def search_payload(
    endpoint: str,
    filter_spec: FilterSpec | None = None,
    fields: "Sequence[str] | str" = (),
    size: int = 10_000,
    from_: int = 0,
    expand: "Sequence[str] | str" = (),
    method: str = "POST",
) -> tuple[str, dict]:
    """(url, payload) for one search page — the reference's request shape
    (gdc.py:221 ``search``; typ='dataframe' handling stays with the
    caller). ``expand`` mirrors the reference's field-group expansion
    (gdc.py:279,286: comma-joined into the ``expand`` param). ``method``
    is validated like the reference (gdc.py:288-296): the SAME payload
    dict serves as the POST JSON body or the GET query-string params —
    ``filters`` is pre-encoded as a JSON string so it survives either
    transport verbatim — so the caller picks
    ``requests.post(url, json=payload)`` (what ``fetch_table`` does) or
    ``requests.get(url, params=payload)``."""
    if endpoint not in VALID_ENDPOINTS:
        raise ValueError(f"endpoint must be one of {VALID_ENDPOINTS}")
    if method.upper() not in ("GET", "POST"):
        # reference error text, gdc.py:292-296
        raise ValueError(
            'Invalid method: {}\n method must be either "GET" '
            'or "POST".'.format(method)
        )
    body: dict = {"size": size, "from": from_}
    gdc_filter = (filter_spec or FilterSpec()).to_gdc()
    if gdc_filter:
        body["filters"] = json.dumps(gdc_filter)
    if fields:
        body["fields"] = _csv_param(fields)
    if expand:
        body["expand"] = _csv_param(expand)
    return f"{GDC_API_BASE}/{endpoint}", body


def data_url(uuid: str) -> str:
    """Download URL for one file UUID (gdc.py:360 ``download``)."""
    return f"{GDC_API_BASE}/data/{uuid}"


def hits_to_df(spark: SparkSession, hits: list[dict]) -> DataFrame:
    """Materialize GDC API hit dicts (nested case/file JSON) as a DataFrame
    with the nested structure intact — the ingestion half of the reference's
    ``search(..., typ='dataframe')`` (gdc.py:221, which pandas-normalizes
    instead). Schema inference runs on executors via ``spark.read.json``;
    downstream normalization is ``operators.nested`` (flatten/explode/drop),
    so the whole pipeline after this point is native Catalyst.
    """
    payload = [json.dumps(h) for h in hits]
    return spark.read.json(
        spark.sparkContext.parallelize(payload or ["{}"])
    )


def fetch_table(
    spark: SparkSession,
    endpoint: str,
    filter_spec: FilterSpec | None = None,
    fields: Sequence[str] = (),
    page_size: int = 10_000,
    n_pages: "int | None" = None,
    expand: "Sequence[str] | str" = (),
    method: str = "POST",
) -> DataFrame:
    """Fetch search pages IN PARALLEL on executors and return the hits as a
    DataFrame (spark.read.json over the responses). Requires network +
    ``requests``; raises if either is unavailable. Page ranges distribute
    one page per task — the driver never holds more than the URLs.
    ``expand``/``method`` mirror the reference's search surface
    (gdc.py:221): GET sends the payload as query-string params, POST as
    the JSON body.

    ``n_pages=None`` (default) PAGES THROUGH EVERYTHING: one tiny driver
    probe reads ``data.pagination.total`` (the reference's search does
    the same size-then-refetch dance, gdc.py:297-300) and the page count
    follows — a >10k-case project is never silently truncated. Pass an
    explicit ``n_pages`` to bound the fetch deliberately.
    """
    try:
        import requests  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "fetch_table needs the 'requests' package and network access; "
            "build payloads with search_payload() and fetch elsewhere"
        ) from exc

    url, base_body = search_payload(
        endpoint, filter_spec, fields, page_size, expand=expand, method=method
    )
    get = method.upper() == "GET"
    if n_pages is None:
        import math

        import requests as rq

        probe_body = dict(base_body, size=1)
        probe = (
            rq.get(url, params=probe_body, timeout=120)
            if get
            else rq.post(url, json=probe_body, timeout=120)
        )
        probe.raise_for_status()
        total = int(probe.json()["data"]["pagination"]["total"])
        n_pages = max(1, math.ceil(total / page_size))

    def _fetch(page: int) -> list[str]:
        import requests as rq

        body = dict(base_body, **{"from": page * page_size})
        if get:
            resp = rq.get(url, params=body, timeout=120)
        else:
            resp = rq.post(url, json=body, timeout=120)
        resp.raise_for_status()
        return [json.dumps(hit) for hit in resp.json()["data"]["hits"]]

    pages = spark.sparkContext.parallelize(range(n_pages), n_pages)
    return spark.read.json(pages.flatMap(_fetch))


def cases_sample_mapping(hits: DataFrame) -> DataFrame:
    """Flatten `cases` search hits (submitter_id + samples.submitter_id,
    the reference's get_gdc_data shape — postprocessing.py:41-62) into
    the flat (sample, case) map the postprocess rename consumes. Pure
    projection + explode over the nested hits frame."""
    from pyspark.sql import functions as F

    return hits.select(
        F.col("submitter_id").alias("case"),
        F.explode("samples").alias("__s"),
    ).select(F.col("__s.submitter_id").alias("sample"), "case")
