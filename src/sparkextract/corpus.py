"""Deterministic synthetic corpus generator (SURVEY.md §7.2 M0).

Produces ``raw_documents(doc_id string, spans array<struct<kind, text,
media_ref, offset>>)`` exactly matching BASELINE.json ``input_hint`` /
FIXTURES.md F1: interleaved html / pdf_layout / media / text spans,
boilerplate-wrapped HTML, ruled + unruled layout tables, form runs,
~0.1% mega-documents (north_rule skew), and the F1 edge-case docs.

Determinism: every document is generated from ``random.Random(f"{seed}:
{index}")`` — independent of generation order, so the same corpus can be
produced single-process (fixtures) or distributed (bench corpora via
``spark.range(n)`` + ``mapInPandas``) with identical bytes.
"""

from __future__ import annotations

import random
from typing import Iterator

from sparkextract import config

_VOCAB = (
    "the quick brown fox jumps over a lazy dog while many small rivers "
    "flow toward distant mountains carrying silt and stories from old "
    "villages where people trade grain cloth copper salt and news about "
    "harvests weather roads bridges markets prices taxes and festivals "
    "that mark each season with music dancing lanterns and long tables "
    "of shared food under open skies"
).split()
_UNICODE_WORDS = ("café", "naïve", "übermäßig", "résumé", "piñata")
_FIELD_NAMES = (
    "first_name", "last_name", "street_address", "city", "postal_code",
    "phone", "email", "company", "department", "title", "status", "notes",
)
_CELL_WORDS = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

MEGA_DOC_MODULUS = 997        # doc index % 997 == 13 → mega doc (~0.1%)
MEGA_SPAN_MIN, MEGA_SPAN_MAX = 600, 1400


def _sentence(rng: random.Random) -> str:
    n = rng.randint(5, 14)
    words = [rng.choice(_VOCAB) for _ in range(n)]
    if rng.random() < 0.05:
        words[rng.randrange(n)] = rng.choice(_UNICODE_WORDS)
    s = " ".join(words)
    return s[0].upper() + s[1:] + rng.choice([".", ".", ".", "!", "?"])


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(2, 6)))


def _prose(rng: random.Random, n_paras: int) -> str:
    return "\n\n".join(_paragraph(rng) for _ in range(n_paras))


def _grid(rng: random.Random, nrows: int | None = None, ncols: int | None = None) -> list[list[str]]:
    nrows = nrows or rng.randint(2, 6)
    ncols = ncols or rng.randint(2, 5)
    header = [f"col_{c}" for c in range(ncols)]
    rows = [header] + [
        [f"{rng.choice(_CELL_WORDS)}_{rng.randint(0, 99)}" for _ in range(ncols)]
        for _ in range(nrows)
    ]
    return rows


def _html_span(rng: random.Random) -> str:
    paras = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(rng.randint(2, 5)))
    nav = "<nav><ul>" + "".join(
        f'<li><a href="/{w}">{w} {w}</a></li>' for w in rng.sample(_VOCAB, 4)
    ) + "</ul></nav>"
    footer = f"<footer><p>copyright {rng.randint(1990, 2030)} example corp all rights reserved</p></footer>"
    script = f"<script>var x = {rng.randint(0, 9)}; track(x);</script>"
    linkfarm = '<div>' + " ".join(
        f'<a href="/t/{w}">{w}</a>' for w in rng.sample(_VOCAB, 6)
    ) + "</div>"
    table = ""
    if rng.random() < 0.4:
        grid = _grid(rng)
        body = "".join(
            "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>" for row in grid
        )
        table = f"<table>{body}</table>"
    form = ""
    if rng.random() < 0.3:
        inputs = "".join(
            f'<input name="{f}" value="{rng.choice(_VOCAB) if rng.random() < 0.7 else ""}"/>'
            for f in rng.sample(_FIELD_NAMES, rng.randint(2, 5))
        )
        form = f"<form>{inputs}</form>"
    return f"<html><body>{nav}<article>{paras}{table}{form}</article>{script}{linkfarm}{footer}</body></html>"


def _ruled_table_lines(rng: random.Random, grid: list[list[str]]) -> str:
    border = "+" + "+".join("-" * 10 for _ in grid[0]) + "+"
    lines = [border]
    for row in grid:
        lines.append("| " + " | ".join(row) + " |")
        lines.append(border)
    return "\n".join(lines)


def _unruled_table_lines(rng: random.Random, grid: list[list[str]]) -> str:
    return "\n".join("   ".join(f"{c:<12}" for c in row).rstrip() for row in grid)


def _form_lines(rng: random.Random) -> str:
    fields = rng.sample(_FIELD_NAMES, rng.randint(2, 6))
    return "\n".join(
        f"{f}: {rng.choice(_VOCAB) if rng.random() < 0.7 else ''}" for f in fields
    )


def _pdf_span(rng: random.Random) -> str:
    parts: list[str] = [_prose(rng, rng.randint(1, 3))]
    r = rng.random()
    if r < 0.45:
        parts.append(_ruled_table_lines(rng, _grid(rng)))
    elif r < 0.8:
        parts.append(_unruled_table_lines(rng, _grid(rng)))
    if rng.random() < 0.35:
        parts.append(_form_lines(rng))
    if rng.random() < 0.5:
        parts.append(_prose(rng, 1))
    return "\n\n".join(parts)


def _make_span(rng: random.Random, doc_id: str, offset: int) -> dict:
    r = rng.random()
    if r < 0.30:
        return {"kind": "html", "text": _html_span(rng), "media_ref": None, "offset": offset}
    if r < 0.60:
        return {"kind": "pdf_layout", "text": _pdf_span(rng), "media_ref": None, "offset": offset}
    if r < 0.75:
        return {"kind": "media", "text": None,
                "media_ref": f"img://{doc_id}/{offset}", "offset": offset}
    return {"kind": "text", "text": _prose(rng, rng.randint(1, 4)), "media_ref": None, "offset": offset}


def _edge_doc(rng: random.Random, doc_id: str, case: int) -> dict:
    """FIXTURES.md F1 edge cases, keyed by ``case`` in [0, 8)."""
    if case == 0:   # empty spans array
        return {"doc_id": doc_id, "spans": []}
    if case == 1:   # single short-text span (< MIN_CHUNK_SIZE → no output)
        return {"doc_id": doc_id, "spans": [
            {"kind": "text", "text": "too short.", "media_ref": None, "offset": 0}]}
    if case == 2:   # all-media doc
        return {"doc_id": doc_id, "spans": [
            {"kind": "media", "text": None, "media_ref": f"img://{doc_id}/{i}", "offset": i}
            for i in range(3)]}
    if case == 3:   # paragraph exactly at CHUNK_SIZE boundary
        word = "boundary "
        para = (word * (config.CHUNK_SIZE // len(word) + 1))[: config.CHUNK_SIZE].strip()
        return {"doc_id": doc_id, "spans": [
            {"kind": "text", "text": para + "\n\n" + _paragraph(rng), "media_ref": None, "offset": 0}]}
    if case == 4:   # 1-column and 1-row tables
        one_col = "\n".join(["| only |", "| one |", "| column |"])
        one_row = "r0   r1   r2\nx0   x1   x2\ny0   y1   y2"
        return {"doc_id": doc_id, "spans": [
            {"kind": "pdf_layout", "text": one_col + "\n\n" + one_row, "media_ref": None, "offset": 0}]}
    if case == 5:   # duplicate tables across two spans (dedup D6)
        grid = _grid(rng, 3, 3)
        t = _ruled_table_lines(rng, grid)
        return {"doc_id": doc_id, "spans": [
            {"kind": "pdf_layout", "text": t, "media_ref": None, "offset": 0},
            {"kind": "pdf_layout", "text": t + "\n\n" + _paragraph(rng), "media_ref": None, "offset": 1}]}
    if case == 6:   # null text on a non-media span
        return {"doc_id": doc_id, "spans": [
            {"kind": "text", "text": None, "media_ref": None, "offset": 0},
            {"kind": "text", "text": _prose(rng, 2), "media_ref": None, "offset": 1}]}
    # case 7: nullish cell sentinels in a table (P2)
    t = "| a | None | b |\n| nan |  | c |\n| None | None | None |"
    return {"doc_id": doc_id, "spans": [
        {"kind": "pdf_layout", "text": t, "media_ref": None, "offset": 0}]}


def generate_document(index: int, seed: int = 42) -> dict:
    """One document, fully determined by (seed, index)."""
    rng = random.Random(f"{seed}:{index}")
    doc_id = f"doc-{seed}-{index:09d}"
    if index % 101 == 3:
        return _edge_doc(rng, doc_id, (index // 101) % 8)
    if index % MEGA_DOC_MODULUS == 13:
        n_spans = rng.randint(MEGA_SPAN_MIN, MEGA_SPAN_MAX)
    else:
        n_spans = rng.randint(1, 8)
    spans = [_make_span(rng, doc_id, off) for off in range(n_spans)]
    return {"doc_id": doc_id, "spans": spans}


def generate_corpus(n_docs: int, seed: int = 42, start: int = 0) -> Iterator[dict]:
    """Yield ``n_docs`` documents starting at ``start``."""
    for i in range(start, start + n_docs):
        yield generate_document(i, seed)
