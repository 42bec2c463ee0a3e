"""pages → points: text extraction and trajectory parsing (SURVEY.md §2.1).

The hot path is PURE CATALYST: extraction is decode → regexp_replace →
three replaces, and point parsing is regexp_extract_all → explode → split —
all JVM-side, whole-stage codegen, zero Python (the round-1 pandas-UDF
versions are kept as reference twins; tests assert byte-identical output).
The extraction is a pure byte-level function of `html` (no locale/env
dependence) so the per-row invariant — byte-identical extracted text per
url vs the stored ground truth — holds on every executor.

Plan shape (SURVEY.md §3.2 EP1, first stage):
  pages --filter(lang)--dedupe(url window)--extract_text--parse_points
        --explode--> points(traj_id, seq, x, y, t, url)
`html` (the huge binary column) is dropped immediately after extraction so
column pruning keeps every downstream stage narrow.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_TAG_RE = re.compile(r"<[^>]*>")
# NOTE: \d is ASCII in Java regex and Unicode in Python; trajectory lines are
# ASCII by construction (fixtures/gen_pages.format_traj_lines), so the
# builtin and UDF parsers agree. The equivalence is test-gated.
_TRAJ_PATTERN = (r"^TRAJ (\d+) (\d+) (-?\d+\.\d{6}) (-?\d+\.\d{6}) "
                 r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})Z$")
_TRAJ_RE = re.compile(_TRAJ_PATTERN, re.M)


# ------------------------------------------------------------ builtin path

def extract_text_col(html: Column) -> Column:
    """Deterministic extraction as a Catalyst expression: utf-8 decode →
    strip tags → unescape the three escaped entities (&lt; &gt; &amp; —
    amp last). Byte-identical to extract_text_str (test-gated)."""
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, "<[^>]*>", "")
    s = F.replace(s, F.lit("&lt;"), F.lit("<"))
    s = F.replace(s, F.lit("&gt;"), F.lit(">"))
    return F.replace(s, F.lit("&amp;"), F.lit("&"))


def parse_points_cols(text: Column) -> Column:
    """Catalyst point parser: multiline regexp_extract_all over the TRAJ
    grammar. Returns the ARRAY<STRING> of matched point lines — explode
    it, then project the typed fields with _point_fields (see
    pages_to_points for the composed shape)."""
    return F.regexp_extract_all(text, F.lit("(?m)" + _TRAJ_PATTERN), 0)


def _point_fields(line: Column) -> list[Column]:
    p = F.split(line, " ")
    return [
        F.get(p, 1).cast("long").alias("traj_id"),
        F.get(p, 2).cast("int").alias("seq"),
        F.get(p, 3).cast("double").alias("x"),
        F.get(p, 4).cast("double").alias("y"),
        F.to_timestamp(F.get(p, 5), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("t"),
    ]


# ------------------------------------------- pandas-UDF reference twins

def extract_text_str(html: bytes) -> str:
    """Scalar reference extractor (fixture oracle + equivalence tests)."""
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


# ------------------------------------------------------------- operators

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
    Pure Catalyst end-to-end (one shuffle: the url-dedupe window).

    use_stored_text=True skips the html extraction (for inputs that carry a
    trusted `text` column already); default re-extracts from html, which is
    the reference-parity path.
    Returns points(traj_id BIGINT, seq INT, x,y DOUBLE, t TIMESTAMP, url STRING).
    """
    df = pages.filter(F.col("lang") == lang)
    df = dedupe_pages(df)
    txt = F.col("text") if use_stored_text else extract_text_col(F.col("html"))
    return (df
            .select("url", F.explode(parse_points_cols(txt)).alias("_ln"))
            .select(*_point_fields(F.col("_ln")), "url"))


def text_sha(pages: DataFrame) -> DataFrame:
    """sha256 of the extracted text per url — the byte-identical invariant
    check (golden_text_sha, FIXTURES.md §4)."""
    deduped = dedupe_pages(pages)
    return deduped.select(
        "url",
        F.sha2(F.encode(extract_text_col(F.col("html")), "UTF-8"), 256).alias("sha256"),
    )
