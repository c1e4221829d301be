"""REST API source — SURVEY §2.1 S1.

The reference fetches fakestoreapi.com with a retrying requests
session on the driver (api_connector.py:68-135).  Spark has no native
REST source; two engine paths:

* driver fetch (small payloads): fetch a JSON list driver-side, then
  spark.createDataFrame(rows, schema) — fine for dimension-sized
  endpoints (the reference's case: 20 products, 7 carts, 10 users).
* distributed fetch (at scale): partition the id/page space with
  spark.range(n) and fetch inside mapInPandas, so 1000 executors pull
  pages in parallel and no single node is the bottleneck.

Network access is injected as a callable so tests (and this offline
container) run against recorded fixtures, exactly like the reference
mocks requests (tests/test_extract.py:12-31).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

Fetcher = Callable[[str], list[dict]]

PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("description", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField(
            "rating",
            T.StructType(
                [
                    T.StructField("rate", T.DoubleType()),
                    T.StructField("count", T.LongType()),
                ]
            ),
        ),
    ]
)

CART_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("userId", T.LongType()),
        T.StructField("date", T.StringType()),
        T.StructField(
            "products",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("productId", T.LongType()),
                        T.StructField("quantity", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)

USER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("email", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField(
            "name",
            T.StructType(
                [
                    T.StructField("firstname", T.StringType()),
                    T.StructField("lastname", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("city", T.StringType()),
                    T.StructField("street", T.StringType()),
                    T.StructField("zipcode", T.StringType()),
                    T.StructField(
                        "geolocation",
                        T.StructType(
                            [
                                T.StructField("lat", T.StringType()),
                                T.StructField("long", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

ENDPOINT_SCHEMAS = {
    "products": PRODUCT_SCHEMA,
    "carts": CART_SCHEMA,
    "users": USER_SCHEMA,
}


def http_fetcher(base_url: str, timeout: int = 30, retries: int = 3) -> Fetcher:
    """Retrying GET fetcher (ref api_connector.py:68-87's session).
    Import-guarded: this container is offline, tests inject fixtures."""
    import urllib.request

    def fetch(endpoint: str) -> list[dict]:
        url = f"{base_url.rstrip('/')}/{endpoint}"
        last: Exception | None = None
        for _ in range(retries):
            try:
                with urllib.request.urlopen(url, timeout=timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except Exception as exc:  # noqa: BLE001 — retry everything
                last = exc
        raise ConnectionError(f"fetch failed for {url}: {last}")

    return fetch


def read_endpoint(
    spark: SparkSession, endpoint: str, fetcher: Fetcher
) -> DataFrame:
    """Driver-side fetch → typed DataFrame (the reference's scale)."""
    rows = fetcher(endpoint)
    schema = ENDPOINT_SCHEMAS[endpoint]
    # Route through JSON strings so nested dicts map onto the declared
    # StructTypes without field-order sensitivity.
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    return spark.read.schema(schema).json(rdd)


def fetch_all(
    spark: SparkSession,
    fetcher: Fetcher,
    save_raw_dir: str | None = None,
) -> dict[str, DataFrame]:
    """All three endpoints → flattened entity frames, optionally
    persisting raw extracts (ref api_connector.py:246-280; raw CSV
    upgraded to parquet per SURVEY §7.1)."""
    from . import readers

    raw = {ep: read_endpoint(spark, ep, fetcher) for ep in ENDPOINT_SCHEMAS}
    if save_raw_dir:
        for ep, df in raw.items():
            df.write.mode("overwrite").parquet(f"{save_raw_dir}/{ep}")
    return {
        "products": readers.with_extraction_metadata(
            readers.flatten_products(raw["products"]), "fake_store_api"
        ),
        "order_items": readers.with_extraction_metadata(
            readers.explode_carts(raw["carts"]), "fake_store_api"
        ),
        "customers": readers.with_extraction_metadata(
            readers.flatten_users(raw["users"]), "fake_store_api"
        ),
    }


def read_endpoint_distributed(
    spark: SparkSession,
    endpoint_for_page: Callable[[int], str],
    n_pages: int,
    schema: T.StructType,
    fetcher: Fetcher,
    parallelism: int = 32,
) -> DataFrame:
    """Scale path: fan page fetches across executors with mapInPandas.

    spark.range(n_pages) is repartitioned so each task owns a slice of
    the page space; every executor fetches and parses independently —
    the driver never holds the payload."""
    import pandas as pd  # noqa: PLC0415 — executor-side import

    pages = spark.range(n_pages).repartition(min(parallelism, max(n_pages, 1)))
    out_schema = T.StructType([T.StructField("json", T.StringType())])

    def fetch_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payload = []
            for page in pdf["id"].tolist():
                for row in fetcher(endpoint_for_page(int(page))):
                    payload.append(json.dumps(row))
            yield pd.DataFrame({"json": payload})

    raw = pages.mapInPandas(fetch_partition, out_schema)
    from pyspark.sql import functions as F

    return raw.select(
        F.from_json(F.col("json"), schema).alias("r")
    ).select("r.*")
