"""RSS 2.0 feed ingestion via stdlib ``xml.etree`` (the RSS 2.0
specification, https://www.rssboard.org/rss-specification): channel
metadata + one row per ``<item>`` with title / link / guid / pubDate
(RFC-822 date-time, parsed with ``email.utils.parsedate_to_datetime``
— the reference parser for that grammar).  Feed archives are a
classic crawl corpus; the shape matches every text source here:
row-local parse over Arrow batches, malformed XML or dates raise
ValueError (shared quarantine contract), nothing shuffles until the
caller aggregates."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RSS_ITEMS_SCHEMA = StructType(
    [
        StructField("key", LongType(), False),
        StructField("channel", StringType(), False),
        StructField("item_title", StringType(), True),
        StructField("link", StringType(), True),
        StructField("guid", StringType(), True),
        StructField("pub_epoch", LongType(), True),
        StructField("n_categories", IntegerType(), False),
    ]
)


def parse_rss(text: str) -> list[dict]:
    """One feed document → item dicts.  Structural errors raise."""
    import email.utils
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(text)
    except ET.ParseError as exc:
        raise ValueError(f"rss: {exc}") from None
    if root.tag != "rss":
        raise ValueError(f"rss: root element {root.tag!r}, want 'rss'")
    channel = root.find("channel")
    if channel is None:
        raise ValueError("rss: missing <channel>")
    ctitle = channel.findtext("title") or ""
    out = []
    for item in channel.findall("item"):
        pub = item.findtext("pubDate")
        epoch = None
        if pub is not None:
            try:
                epoch = int(
                    email.utils.parsedate_to_datetime(pub).timestamp()
                )
            except (TypeError, ValueError) as exc:
                raise ValueError(f"rss: bad pubDate {pub!r}: {exc}") \
                    from None
        out.append(
            {
                "channel": ctitle,
                "item_title": item.findtext("title"),
                "link": item.findtext("link"),
                "guid": item.findtext("guid"),
                "pub_epoch": epoch,
                "n_categories": len(item.findall("category")),
            }
        )
    return out


def rss_items(
    df: DataFrame, *, text_col: str = "rss", key: str = "key"
) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                f.name: [] for f in RSS_ITEMS_SCHEMA.fields
            }
            for k, text in zip(pdf[key], pdf[text_col]):
                for item in parse_rss(str(text)):
                    rows["key"].append(int(k))
                    for name in (
                        "channel", "item_title", "link", "guid",
                        "pub_epoch", "n_categories",
                    ):
                        rows[name].append(item[name])
            yield pd.DataFrame(
                {
                    "key": pd.Series(rows["key"], dtype="int64"),
                    "channel": pd.Series(
                        rows["channel"], dtype="object"
                    ),
                    "item_title": pd.Series(
                        rows["item_title"], dtype="object"
                    ),
                    "link": pd.Series(rows["link"], dtype="object"),
                    "guid": pd.Series(rows["guid"], dtype="object"),
                    "pub_epoch": pd.Series(
                        rows["pub_epoch"], dtype="Int64"
                    ),
                    "n_categories": pd.Series(
                        rows["n_categories"], dtype="int32"
                    ),
                }
            )

    return df.mapInPandas(batches, schema=RSS_ITEMS_SCHEMA)
