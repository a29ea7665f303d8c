"""Minimal stdlib .xlsx reader (zipfile + ElementTree).

The container ships no Excel engine (openpyxl/xlrd absent), but the
reference's terminal/blacklist snapshots are xlsx (SURVEY.md §2.1
SRC2/SRC3 — /root/reference/main.py:18-19, 212-215), so we parse the
OOXML directly: an .xlsx is a zip holding ``xl/worksheets/sheet1.xml``
(cells) and ``xl/sharedStrings.xml`` (string pool). Only the features
those files use are supported: shared strings, inline numbers (incl.
Excel date serials), blank/styled-blank rows.

Scale note: this runs driver-side on purpose. Dimension snapshots are a
few hundred rows; big data never arrives as xlsx (SURVEY.md §2.1 SRC2
documents the 100 TB caveat — large inputs use the CSV/parquet path).
"""

from __future__ import annotations

import datetime as dt
import re
import zipfile
import xml.etree.ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")

#: Excel serial 0 == 1899-12-30 (the 1900 leap-year bug is baked into the
#: epoch offset; serials in these files are all > 60).
_EXCEL_EPOCH = dt.date(1899, 12, 30)


def _col_index(ref: str) -> int:
    """'A'->0, 'B'->1, ..., 'AA'->26."""
    m = _CELL_REF.match(ref)
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def serial_to_date(serial: float) -> dt.date:
    return _EXCEL_EPOCH + dt.timedelta(days=int(serial))


def read_sheet(path: str) -> list[list]:
    """Return the first worksheet as a list of rows (lists of values).

    Values are ``str`` (shared/inline strings), ``float``/``int``
    (numeric cells — date serials stay numeric; the caller decides which
    columns are dates), or ``None`` for blank cells. Trailing styled-but-
    blank rows come back as all-None rows (the caller drops them —
    SURVEY.md §1.4 quirk 4).
    """
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                # a <si> is either one <t> or rich-text <r><t> runs
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        # "first worksheet" = lowest sheet NUMBER, not first zip entry:
        # archive member order is arbitrary, and a multi-sheet file can
        # store sheet2.xml before sheet1.xml (zips written by some
        # producers sort lexicographically, putting sheet10 before
        # sheet2 too). Workbook-defined order would need workbook.xml +
        # rels resolution; numeric sheet order matches it for every
        # ordinary producer and is deterministic regardless of zip
        # layout.
        def _sheet_no(name: str) -> tuple[int, str]:
            m = re.search(r"sheet(\d+)\.xml$", name)
            return (int(m.group(1)) if m else 1 << 30, name)

        sheet_name = min(
            (
                n
                for n in z.namelist()
                if n.startswith("xl/worksheets/sheet")
            ),
            key=_sheet_no,
        )
        root = ET.fromstring(z.read(sheet_name))

    rows: list[list] = []
    ncols = 0
    for row_el in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row_el.iter(f"{_NS}c"):
            ref = c.get("r", "")
            idx = _col_index(ref) if ref else len(cells)
            ctype = c.get("t", "n")
            v = c.find(f"{_NS}v")
            if ctype == "inlineStr":
                cells[idx] = "".join(
                    t.text or "" for t in c.iter(f"{_NS}t")
                )
                continue
            if v is None or v.text is None:
                cells[idx] = None
                continue
            if ctype == "s":
                cells[idx] = shared[int(v.text)]
            elif ctype == "str":
                cells[idx] = v.text
            else:  # numeric
                num = float(v.text)
                cells[idx] = int(num) if num.is_integer() else num
        if cells:
            ncols = max(ncols, max(cells) + 1)
        rows.append(cells)

    return [
        [row.get(i) for i in range(ncols)] for row in rows
    ]


def read_table(path: str, date_cols: tuple[str, ...] = ()) -> tuple[list[str], list[list]]:
    """Read the first sheet as (header, data_rows).

    - header = first row stringified;
    - all-blank rows are dropped (quirk 4: styled-blank xlsx rows);
    - columns named in ``date_cols`` have numeric serials converted to
      ``datetime.date`` (quirk 5: dates arrive as Excel serials).
    """
    raw = read_sheet(path)
    if not raw:
        return [], []
    header = [str(v) if v is not None else "" for v in raw[0]]
    date_idx = {i for i, h in enumerate(header) if h in date_cols}
    out = []
    for row in raw[1:]:
        if all(v is None for v in row):
            continue
        vals = list(row)
        for i in date_idx:
            if isinstance(vals[i], (int, float)):
                vals[i] = serial_to_date(vals[i])
        out.append(vals)
    return header, out
