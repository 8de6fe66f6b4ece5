"""PDF-layout parsing: ruled + unruled table detection, form runs, prose.

The reference runs four table engines per PDF (camelot lattice/stream,
tabula, pdfplumber, pymupdf — /root/reference/src/table_extractor.py) and
races them. Our input spans carry *layout text* (lines), so table
detection reduces to two deterministic line classifiers:

- RULED ('lattice' analog, reference settings.py:34-41): consecutive lines
  drawn with '|' cell separators and optional +---+ border rules;
- UNRULED ('stream' analog, reference table_extractor.py:124-140):
  >= UNRULED_MIN_ROWS consecutive lines whose columns are separated by
  runs of 2+ spaces with a consistent column count.

Form runs (>= FORM_MIN_RUN consecutive `key: value` lines) mirror the
PDF-widget extraction (/root/reference/src/form_extractor.py:34-44).
Everything else is prose, re-joined into paragraphs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from sparkextract import config
from sparkextract.core.normalize import clean_table

_BORDER_RE = re.compile(r"^\s*\+[-+=]*\+\s*$")
_GAP_RE = re.compile(config.UNRULED_GAP_RE)
_FORM_RE = re.compile(config.FORM_KEY_RE)


@dataclass
class PdfContent:
    paragraphs_text: str = ""
    tables: list[list[list[str]]] = field(default_factory=list)
    form_fields: list[tuple[str, str]] = field(default_factory=list)


def _is_ruled_row(line: str) -> bool:
    return line.count("|") >= config.RULED_MIN_PIPES


def _is_border(line: str) -> bool:
    return bool(_BORDER_RE.match(line))


def _ruled_cells(line: str) -> list[str]:
    parts = line.split("|")
    # drop the empty edges produced by leading/trailing pipes
    if parts and not parts[0].strip():
        parts = parts[1:]
    if parts and not parts[-1].strip():
        parts = parts[:-1]
    return [p.strip() for p in parts]


def _unruled_cells(line: str) -> list[str]:
    return [p for p in _GAP_RE.split(line.strip()) if p]


def _form_match(line: str) -> tuple[str, str] | None:
    if len(line) > config.FORM_MAX_LINE:
        return None
    if ":" not in line:  # exact-safe pre-check: FORM_KEY_RE requires ':'
        return None
    m = _FORM_RE.match(line)
    if not m:
        return None
    key = m.group(1).strip()
    if "." in key:
        return None
    return key, (m.group(2) or "").strip()


def parse_pdf_layout(text: str) -> PdfContent:
    """Classify layout lines into tables / form runs / prose paragraphs.

    Single forward scan with greedy run detection; precedence per line
    block: ruled table > unruled table > form run > prose. Deterministic —
    no geometry tolerances beyond the frozen config constants.
    """
    out = PdfContent()
    lines = text.split("\n")
    prose: list[str] = []
    i, n = 0, len(lines)

    while i < n:
        line = lines[i]

        # ---- ruled table run -------------------------------------------
        if _is_ruled_row(line) or (_is_border(line) and i + 1 < n and _is_ruled_row(lines[i + 1])):
            rows: list[list[str]] = []
            while i < n and (_is_ruled_row(lines[i]) or _is_border(lines[i])):
                if _is_ruled_row(lines[i]):
                    rows.append(_ruled_cells(lines[i]))
                i += 1
            if rows:
                out.tables.append(rows)
            continue

        # ---- unruled (whitespace-gap) table run ------------------------
        cells = _unruled_cells(line)
        if len(cells) >= config.UNRULED_MIN_COLS:
            j = i
            run: list[list[str]] = []
            while j < n:
                c = _unruled_cells(lines[j])
                if len(c) == len(cells):
                    run.append(c)
                    j += 1
                else:
                    break
            if len(run) >= config.UNRULED_MIN_ROWS:
                out.tables.append(run)
                i = j
                continue

        # ---- form run ---------------------------------------------------
        if _form_match(line) is not None:
            j = i
            fields: list[tuple[str, str]] = []
            while j < n:
                fm = _form_match(lines[j])
                if fm is None:
                    break
                fields.append(fm)
                j += 1
            if len(fields) >= config.FORM_MIN_RUN:
                out.form_fields.extend(fields)
                i = j
                continue

        # ---- prose ------------------------------------------------------
        prose.append(line)
        i += 1

    out.paragraphs_text = "\n".join(prose)
    return out


def render_table(cells: list[list[object]]) -> str | None:
    """Canonical text rendering of a cleaned cell grid (F4 analog,
    /root/reference/src/rag/text_processor.py:387-423 'csv' rendering):
    rows joined by newlines, cells by ', ', None cells rendered empty.
    Returns None for a grid that cleans to empty."""
    cleaned = clean_table(cells)
    if not cleaned:
        return None
    return "\n".join(", ".join(c if c is not None else "" for c in row) for row in cleaned)


def render_form(fields: list[tuple[str, str]]) -> str | None:
    """F5 rendering (/root/reference/src/rag/text_processor.py:494-510):
    one `name: value` line per field, empty values rendered as
    FORM_EMPTY_VALUE; duplicate names keep the first occurrence (D1
    first-writer-wins, /root/reference/src/form_extractor.py:478-506)."""
    seen: set[str] = set()
    lines: list[str] = []
    for name, value in fields:
        if not name or name in seen:
            continue
        seen.add(name)
        lines.append(f"{name}: {value if value else config.FORM_EMPTY_VALUE}")
    return "\n".join(lines) if lines else None
