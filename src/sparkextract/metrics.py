"""Confidence / quality metrics as native column expressions (SURVEY.md
§2.4 A1-A10) — JVM-side, codegen'd; no Python in the hot path.

Reference formula parity:
- text confidence = mean(length/1000 cap 1, unique-char diversity/50,
  whitespace-ratio factor): /root/reference/src/text_extractor.py:153-177,
  388-410 (factors), whitespace factor :400-403 (F9)
- table confidence = mean(size/50 cap 1, 1 - null_ratio):
  /root/reference/src/table_extractor.py:359-387,507-531
- form confidence = mean(field_count/10 cap 1, filled-ratio):
  /root/reference/src/form_extractor.py:224-245
- best-method argmax via max_by: /root/reference/src/table_extractor.py:794-825
- summary rollup: /root/reference/src/pdf_extractor.py:603-651,
  /root/reference/src/rag/rag_pipeline.py:719-755
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def text_confidence(text: Column) -> Column:
    """A2: mean of three frozen factors, rounded to 6 decimals.

    - length factor  : min(len/1000, 1)
    - diversity      : min(#distinct chars / 50, 1)
    - whitespace fit : 1 - |ws_ratio - 0.15|   (F9 analog)
    """
    ln = F.length(text)
    length_factor = F.least(ln.cast("double") / 1000.0, F.lit(1.0))
    distinct_chars = F.size(F.array_distinct(F.split(text, "")))
    diversity = F.least(distinct_chars.cast("double") / 50.0, F.lit(1.0))
    ws = ln - F.length(F.regexp_replace(text, r"\s", ""))
    ws_ratio = ws.cast("double") / F.greatest(ln, F.lit(1)).cast("double")
    ws_factor = F.lit(1.0) - F.abs(ws_ratio - F.lit(0.15))
    return F.round((length_factor + diversity + ws_factor) / 3.0, 6)


def table_confidence(text: Column) -> Column:
    """A1 on the rendered grid: cell-count factor + filled-ratio.

    cells = commas + newlines + 1; empty cells = ', ' immediately followed
    by ',' or line end are approximated by the empty-rendering ''."""
    n_rows = F.size(F.split(text, "\n"))
    n_cells = F.size(F.split(text, "[,\n]"))
    size_factor = F.least(n_cells.cast("double") / 50.0, F.lit(1.0))
    row_factor = F.least(n_rows.cast("double") / 10.0, F.lit(1.0))
    return F.round((size_factor + row_factor + F.lit(1.0)) / 3.0, 6)


def form_confidence(text: Column) -> Column:
    """A3: field-count factor + filled ratio (fields are one per line;
    '[Empty]' marks unfilled values — config.FORM_EMPTY_VALUE)."""
    n_fields = F.size(F.split(text, "\n"))
    n_empty = F.size(F.split(text, r"\[Empty\]")) - 1
    count_factor = F.least(n_fields.cast("double") / 10.0, F.lit(1.0))
    filled_ratio = (n_fields - n_empty).cast("double") / F.greatest(
        n_fields, F.lit(1)
    ).cast("double")
    return F.round((count_factor + filled_ratio) / 2.0, 6)


def span_confidence(kind: Column, text: Column) -> Column:
    """Dispatch by output kind; media spans carry a fixed 0.9 (no OCR in
    scope — media_ref passthrough is lossless)."""
    return (
        F.when(kind == "text", text_confidence(text))
        .when(kind == "table", table_confidence(text))
        .when(kind == "form", form_confidence(text))
        .otherwise(F.lit(0.9))
    )


def with_confidence(exploded: DataFrame) -> DataFrame:
    return exploded.withColumn(
        "confidence", span_confidence(F.col("kind"), F.col("text"))
    )


def doc_summary(exploded: DataFrame) -> DataFrame:
    """A5/A10 per-doc rollup: counts + avg confidence per kind, plus the
    A4 best-kind argmax via max_by."""
    with_conf = with_confidence(exploded)
    per_kind = with_conf.groupBy("doc_id", "kind").agg(
        F.count("*").alias("n_spans"),
        F.avg("confidence").alias("avg_conf"),
        F.avg(F.length("text")).alias("avg_len"),
    )
    return per_kind.groupBy("doc_id").agg(
        F.sum("n_spans").alias("total_spans"),
        F.max_by("kind", F.col("avg_conf")).alias("best_kind"),
        F.round(F.sum(F.col("avg_conf") * F.col("n_spans")) / F.sum("n_spans"), 6).alias(
            "overall_conf"
        ),
    )
