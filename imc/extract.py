"""pages → points: text extraction and trajectory parsing (SURVEY.md §2.1).

All Python work is vectorized pandas UDFs over Arrow batches — no per-row
`udf()` anywhere (BASELINE.json input_hint mandate). The extraction is a
pure byte-level function of `html` (no locale/env dependence) so the
per-row invariant — byte-identical extracted text per url vs the stored
ground truth — holds on every executor.

Plan shape (SURVEY.md §3.2 EP1, first stage):
  pages --filter(lang)--dedupe(url window)--extract_text--parse_points
        --explode--> points(traj_id, seq, x, y, t, url)
`html` (the huge binary column) is dropped immediately after extraction so
column pruning keeps every downstream stage narrow.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_TAG_RE = re.compile(r"<[^>]*>")
_TRAJ_RE = re.compile(
    r"^TRAJ (\d+) (\d+) (-?\d+\.\d{6}) (-?\d+\.\d{6}) (\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})Z$",
    re.M,
)


def extract_text_str(html: bytes) -> str:
    """Deterministic extraction: utf-8 decode → strip tags → unescape the
    three escaped entities (&lt; &gt; &amp; — amp last)."""
    s = html.decode("utf-8")
    s = _TAG_RE.sub("", s)
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(extract_text_str)


_POINT_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("traj_id", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("t", T.TimestampType()),
]))


def _parse_one(text: str) -> list:
    out = []
    for m in _TRAJ_RE.finditer(text):
        out.append((int(m.group(1)), int(m.group(2)), float(m.group(3)),
                    float(m.group(4)), pd.Timestamp(m.group(5))))
    return out


@pandas_udf(_POINT_SCHEMA)
def parse_points(text: pd.Series) -> pd.Series:
    return text.map(_parse_one)


def dedupe_pages(pages: DataFrame) -> DataFrame:
    """One row per url: latest warc_ts wins (deterministic tie-break on the
    longer text). Window + row_number (SURVEY.md §2.2)."""
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc(F.length("text")))
    return (pages
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))


def pages_to_points(pages: DataFrame, lang: str = "en",
                    use_stored_text: bool = False) -> DataFrame:
    """The full first stage: filter → dedupe → extract → parse → explode.

    use_stored_text=True skips the html extraction (for inputs that carry a
    trusted `text` column already); default re-extracts from html, which is
    the reference-parity path.
    Returns points(traj_id BIGINT, seq INT, x,y DOUBLE, t TIMESTAMP, url STRING).
    """
    df = pages.filter(F.col("lang") == lang)
    df = dedupe_pages(df)
    if use_stored_text:
        df = df.select("url", F.col("text").alias("_text"))
    else:
        df = df.select("url", extract_text(F.col("html")).alias("_text"))
    pts = (df
           .select("url", F.explode(parse_points(F.col("_text"))).alias("p"))
           .select(F.col("p.traj_id").alias("traj_id"),
                   F.col("p.seq").alias("seq"),
                   F.col("p.x").alias("x"),
                   F.col("p.y").alias("y"),
                   F.col("p.t").alias("t"),
                   "url"))
    return pts


def text_sha(pages: DataFrame) -> DataFrame:
    """sha256 of the extracted text per url — the byte-identical invariant
    check (golden_text_sha, FIXTURES.md §4)."""
    deduped = dedupe_pages(pages)
    return deduped.select(
        "url",
        F.sha2(F.encode(extract_text(F.col("html")), "UTF-8"), 256).alias("sha256"),
    )
