"""Deterministic pseudo-OCR for media spans (SURVEY.md §2 S7/P7).

Reference behavior: ``image_ocr`` chunks carry engine-produced text that
enters the ordered chunk sequence
(/root/reference/src/image_extractor.py:337-549 tesseract/easyocr OCR;
/root/reference/src/rag/text_processor.py:38-87 ordering). The sandbox
has no OCR engine and BASELINE.json's ``input_hint`` carries media as
opaque ``media_ref`` strings, so the decode step synthesizes
deterministic "OCR output" from the payload hash: stable across engines,
and SQL-reproducible so the DuckDB oracle can derive the expected text
(`queries/extraction.py ocr_sql`).

The raw synthesis carries the artifacts a real OCR emits (runs of
spaces/tabs) and is routed through the P7 clean chain (``collapse_ws``),
exactly as the reference cleans tesseract output
(/root/reference/src/image_extractor.py:533-549). On a real cluster,
swap ``pseudo_ocr_raw`` for the OCR call; the clean chain and the span
plumbing downstream are unchanged.
"""

from __future__ import annotations

from sparkextract.core.normalize import collapse_ws, md5_hex


def pseudo_ocr_raw(payload_md5: str) -> str:
    """Synthesized raw OCR output for a payload with the given md5 hex
    digest — includes the whitespace artifacts P7 must clean."""
    page = int(payload_md5[16], 16) % 10
    return f"scan  {payload_md5[:8]}\t{payload_md5[8:16]} page {page}"


def pseudo_ocr_text(media_ref: str | None) -> str:
    """Cleaned pseudo-OCR text for a media span, keyed by its ref.

    Fixed length OCR_TEXT_LEN (hash fields are fixed-width, the page
    digit is single-decimal), which the SQL oracles rely on for length
    arithmetic."""
    return collapse_ws(pseudo_ocr_raw(md5_hex(media_ref or "")))


# 'scan ' + 8 + ' ' + 8 + ' page ' + 1
OCR_TEXT_LEN = 29
