"""S4: Excel summary sink — minimal stdlib-only .xlsx writer.

Reference parity: ``save_tables_to_excel``
(/root/reference/src/utils/file_utils.py:47-65) writes a LIST of small
summary tables into one workbook, one sheet per table, sheet names
truncated to Excel's 31-char limit with path separators replaced.

The sandbox has no xlsxwriter/openpyxl, and none is needed: .xlsx is a
zip of SpreadsheetML parts, and summary tables are tiny — this writes
workbook.xml + one inline-string worksheet per table with the stdlib
``zipfile``/XML escaping only.

Scale stance (same as the reference's): this is a DRIVER-SIDE summary
sink for human-sized reports (per-kind stats, confidence rollups), not
a data sink — ``max_rows`` guards against accidentally collecting a
data-scale DataFrame; bulk output goes to the manifest-committed
parquet sink (S9).
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape

# XML 1.0 forbids most control chars and surrogates outright — escape()
# does not handle them, so they are stripped (what real xlsx writers do)
_XML_INVALID = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff\ufffe\uffff]")


def _xml_text(s: str) -> str:
    # \r must be entity-encoded or XML line-ending normalization folds it
    # to \n on read
    return escape(_XML_INVALID.sub("", s), {"\r": "&#13;"})


def _xml_attr(s: str) -> str:
    # attribute context additionally needs quote escaping
    return escape(_XML_INVALID.sub("", s), {"\r": "&#13;", '"': "&quot;", "'": "&apos;"})


from pyspark.sql import DataFrame

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
</Relationships>"""


def _col_letter(i: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (value != value or value in (float("inf"), float("-inf"))):
            # NaN/Inf are invalid in numeric SpreadsheetML cells — render
            # as an inline string, matching how they print
            return f'<c r="{ref}" t="inlineStr"><is><t>{value!r}</t></is></c>'
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t>{_xml_text(str(value))}</t></is></c>'


def _sheet_xml(header: list[str], rows: list[tuple]) -> str:
    lines = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    lines.append(
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
    )
    all_rows = [tuple(header)] + rows
    for r, row in enumerate(all_rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        lines.append(f'<row r="{r}">{cells}</row>')
    lines.append("</sheetData></worksheet>")
    return "".join(lines)


def clean_sheet_name(name: str) -> str:
    """Excel limits mirrored from the reference (file_utils.py:56-57):
    31 chars max, path separators replaced."""
    return str(name)[:31].replace("/", "_").replace("\\", "_")


def save_tables_to_excel(
    tables: list[DataFrame],
    output_path: str,
    sheet_names: list[str] | None = None,
    max_rows: int = 10_000,
) -> int:
    """Write each DataFrame as one sheet of ``output_path``. Returns the
    total number of data rows written. Raises if any table exceeds
    ``max_rows`` — this sink is for driver-sized summaries only."""
    if not tables:
        raise ValueError("OOXML requires at least one sheet; got an empty tables list")
    sheets_meta: list[str] = []
    sheet_parts = []
    for i, df in enumerate(tables):
        name = clean_sheet_name(
            sheet_names[i] if sheet_names and i < len(sheet_names) else f"Table_{i + 1}"
        )
        if name in sheets_meta:
            # duplicate names (e.g. two titles sharing a 31-char prefix)
            # make Excel reject the workbook — disambiguate by index
            name = clean_sheet_name(f"{name[:27]}_{i + 1}")
        rows = [tuple(r) for r in df.limit(max_rows + 1).collect()]
        if len(rows) > max_rows:
            raise ValueError(
                f"sheet {name!r} exceeds max_rows={max_rows}; "
                "use the parquet sink for data-scale output"
            )
        sheets_meta.append(name)
        sheet_parts.append(_sheet_xml(list(df.columns), rows))

    n = len(sheet_parts)
    overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(n)
    )
    sheets = "".join(
        f'<sheet name="{_xml_attr(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(sheets_meta)
    )
    rels = "\n".join(
        f'<Relationship Id="rId{i + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(n)
    )
    with zipfile.ZipFile(output_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK.format(sheets=sheets))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS.format(rels=rels))
        for i, part in enumerate(sheet_parts):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", part)
    return sum(len(p.split("<row ")) - 2 for p in sheet_parts)
