"""mbox ingestion — a from-scratch parser of the classic Unix mailbox
container (the ``mboxrd`` convention): messages begin at lines starting
``From `` (the envelope separator), headers run to the first blank
line, and body lines that would collide with the separator are
``>``-escaped — ``>From``/``>>From``/… lose exactly one ``>`` on read
(the mboxrd unescape rule).  The companion to the single-message EML
source (`sources/mime.py`): same headers, but the CONTAINER framing —
separator detection, header/body split, From-munging — is the part a
naive line-splitter gets wrong.  Row-local over Arrow batches;
malformed input (no envelope, header continuation before any header)
raises ValueError for the quarantine path."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MBOX_ROWS_SCHEMA = StructType(
    [
        StructField("key", LongType(), False),
        StructField("n_msgs", IntegerType(), False),
        StructField("n_body_lines", LongType(), False),
        StructField("n_unescaped", LongType(), False),
        StructField("n_distinct_subjects", IntegerType(), False),
        StructField("body_chars", LongType(), False),
    ]
)


def synth_mbox(key: int) -> str:
    """Deterministic mailbox: ``1 + key % 3`` messages; message ``i``
    has headers From/Date/Subject, a body of ``2 + (key + i) % 3``
    numbered lines plus one ``From the archive`` line stored
    ``>``-escaped (the mboxrd rule the reader must undo)."""
    out: list[str] = []
    for i in range(1 + key % 3):
        out.append(f"From sender{i}@example.com Thu Jan  1 00:00:0{i} 2024")
        out.append(f"From: sender{i}@example.com")
        out.append(f"Date: 2024-01-0{1 + i}")
        out.append(f"Subject: msg{(key + i) % 4}")
        out.append("")
        for ln in range(2 + (key + i) % 3):
            out.append(f"body line {ln} of message {i}")
        out.append(">From the archive")
        out.append("")
    return "\n".join(out) + "\n"


def parse_mbox(text: str) -> dict:
    """Per-mailbox rollup: message count, body line/char volume AFTER
    mboxrd unescaping, how many lines needed unescaping, and distinct
    Subject headers."""
    n_msgs = 0
    n_body_lines = 0
    n_unescaped = 0
    body_chars = 0
    subjects: set[str] = set()
    in_headers = False
    in_body = False
    seen_any = False
    for ln, raw in enumerate(text.splitlines(), 1):
        if raw.startswith("From "):
            n_msgs += 1
            in_headers = True
            in_body = False
            seen_any = True
            continue
        if not seen_any:
            if raw.strip():
                raise ValueError(
                    f"mbox: content before first envelope, line {ln}"
                )
            continue
        if in_headers:
            if raw == "":
                in_headers = False
                in_body = True
                continue
            if raw[0] in " \t":
                continue  # header continuation
            name, sep, value = raw.partition(":")
            if not sep:
                raise ValueError(f"mbox: malformed header, line {ln}")
            if name.strip().lower() == "subject":
                subjects.add(value.strip())
            continue
        if in_body:
            line = raw
            # mboxrd unescape: a body line of >*From loses one '>'
            stripped = line.lstrip(">")
            if stripped.startswith("From ") and line.startswith(">"):
                line = line[1:]
                n_unescaped += 1
            if line == "":
                continue  # message-terminating blank line
            n_body_lines += 1
            body_chars += len(line)
    if n_msgs == 0:
        raise ValueError("mbox: no messages")
    return {
        "n_msgs": n_msgs,
        "n_body_lines": n_body_lines,
        "n_unescaped": n_unescaped,
        "n_distinct_subjects": len(subjects),
        "body_chars": body_chars,
    }


def mbox_rows(
    df: DataFrame, *, text_col: str = "mbox", key: str = "key"
) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                f.name: [] for f in MBOX_ROWS_SCHEMA.fields
            }
            for k, text in zip(pdf[key], pdf[text_col]):
                m = parse_mbox(str(text))
                out["key"].append(int(k))
                for name in (
                    "n_msgs", "n_body_lines", "n_unescaped",
                    "n_distinct_subjects", "body_chars",
                ):
                    out[name].append(m[name])
            yield pd.DataFrame(
                {
                    "key": pd.Series(out["key"], dtype="int64"),
                    "n_msgs": pd.Series(out["n_msgs"], dtype="int32"),
                    "n_body_lines": pd.Series(
                        out["n_body_lines"], dtype="int64"
                    ),
                    "n_unescaped": pd.Series(
                        out["n_unescaped"], dtype="int64"
                    ),
                    "n_distinct_subjects": pd.Series(
                        out["n_distinct_subjects"], dtype="int32"
                    ),
                    "body_chars": pd.Series(
                        out["body_chars"], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(batches, schema=MBOX_ROWS_SCHEMA)
