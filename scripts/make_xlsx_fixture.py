#!/usr/bin/env python3
"""Independent-writer xlsx fixture (r15 verdict #4, driver-side).

XlsxSource was until now proven only against workbooks produced by its
own sibling writer (`XlsxSource.writeXlsx`) — the one structured
source without independent-writer evidence (the SQLite fixture's
goldens come from CPython's sqlite3; XML's from ElementTree). The host
has no wild workbook (409k-file magic-byte scan, PLANS.md r15), so
this script fills the same evidence gap from the other side: a
workbook built with CPython's zipfile + hand-written OOXML parts,
sharing zero code with the Scala writer, exercising shapes writeXlsx
NEVER emits:

- default spreadsheetml namespace on every part (writeXlsx emits
  unprefixed elements), r:id attributes under a prefixed namespace
- non-sequential sheet rIds and non-canonical worksheet part names
  (sheet99.xml), one rel target with a leading slash (/xl/...)
- sharedStrings with rich-text runs (<si><r><t>..</t></r>...), a
  xml:space="preserve" entry with trailing space, unicode + escapes,
  repeated strings across rows
- inline strings (t="inlineStr"), booleans (t="b"), formula cells
  with cached values (<f>..</f><v>..</v>), style-only blank cells
  (<c s="1"/> with no value — a GAP, not ""), rows with r-less cells
  (sequential fallback), a fully empty <row/>, gap columns via r refs
- styles.xml with number formats + docProps + theme parts the reader
  must skip

Goldens (wild_book_golden.json) are computed by THIS script's own
arithmetic over its own data arrays — never by reading the file back.
"""
import json, os, zipfile

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "src", "test", "resources", "graft")
XLSX = os.path.join(OUT_DIR, "wild_book.xlsx")
GOLDEN = os.path.join(OUT_DIR, "wild_book_golden.json")

NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
NSR = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def esc(s):
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace('"', "&quot;"))


# ---- deterministic data (xorshift64*) ----
def gen_rows(n=200):
    x = 0x9E3779B97F4A7C15
    plants = ["Kraftwerk Nord", "solar/ost", "Wind & See",
              "Pumpspeicher <Süd>", "Bioénergie", "水力",
              "trailing space ", "plain"]
    rows = []
    for i in range(n):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        plant = plants[x % len(plants)]
        mw_q = (i * 137) % 9000 + (x % 4) * 2250  # quarter-MW units
        note = f"note_{i}" if i % 3 == 0 else None
        flag = (i % 2 == 0)
        serial = i * 2 + 1
        extra = f"x{i}" if i % 5 == 0 else None
        rows.append((plant, mw_q, note, flag, serial, extra))
    return rows


ROWS = gen_rows()
HEADER = ["plant", "mw", "note", "flag", "serial", "extra"]

# shared-string table: header cells + plant names, deduplicated in
# first-use order (like a real writer's string table)
sst, sst_idx = [], {}


def sidx(s):
    if s not in sst_idx:
        sst_idx[s] = len(sst)
        sst.append(s)
    return sst_idx[s]


for h in HEADER:
    sidx(h)
for r in ROWS:
    sidx(r[0])


def shared_strings_xml():
    parts = [f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             f'<sst xmlns="{NS}" count="{len(sst)}" '
             f'uniqueCount="{len(sst)}">']
    for s in sst:
        if s == "Wind & See":
            # rich-text runs: the reader must concatenate <t> pieces
            parts.append('<si><r><rPr><b/></rPr><t>Wind</t></r>'
                         '<r><t xml:space="preserve"> &amp; </t></r>'
                         '<r><t>See</t></r></si>')
        elif s.endswith(" "):
            parts.append(f'<si><t xml:space="preserve">{esc(s)}</t></si>')
        else:
            parts.append(f"<si><t>{esc(s)}</t></si>")
    parts.append("</sst>")
    return "".join(parts)


def col_ref(i):
    ref = ""
    i += 1
    while i > 0:
        i, rem = divmod(i - 1, 26)
        ref = chr(ord("A") + rem) + ref
    return ref


def data_sheet_xml():
    """Sheet 'data': header + 200 data rows + one empty row at the end.

    Cell-shape rotation (writeXlsx emits none of these):
    - plant: t="s" shared string
    - mw: plain numeric with a style (s="1" -> #,##0.00 format; the
      raw <v> is what the reader must surface)
    - note: t="inlineStr" when present; on i%9==0 a style-only blank
      <c s="2"/> (must read as a GAP/null, not "")
    - flag: t="b" 0/1
    - serial: formula cell <f>..</f><v>cached</v> (reader takes <v>)
    - extra: present only on i%5==0 (gap column via r= refs)
    Rows with i%4==0 carry NO r attributes anywhere (sequential
    fallback) — those rows always write all six cells (inline empty
    string for an absent note so positions stay aligned; an empty
    inlineStr is "", which na_values turns into null).
    """
    out = [f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<worksheet xmlns="{NS}" xmlns:r="{NSR}"><sheetData>']
    hdr = "".join(
        f'<c r="{col_ref(i)}1" t="s"><v>{sidx(h)}</v></c>'
        for i, h in enumerate(HEADER))
    out.append(f'<row r="1">{hdr}</row>')
    for i, (plant, mw_q, note, flag, serial, extra) in enumerate(ROWS):
        rn = i + 2
        mw = f"{mw_q // 4}.{mw_q % 4 * 25:02d}".rstrip("0").rstrip(".")
        if i % 4 == 0:
            cells = [
                f'<c t="s"><v>{sidx(plant)}</v></c>',
                f'<c s="1"><v>{mw}</v></c>',
                f'<c t="inlineStr"><is><t>{esc(note or "")}</t></is></c>',
                f'<c t="b"><v>{1 if flag else 0}</v></c>',
                f'<c><f>ROW()*2-3</f><v>{serial}</v></c>',
                (f'<c t="inlineStr"><is><t>{esc(extra)}</t></is></c>'
                 if extra is not None else "")]
            out.append(f"<row>{''.join(c for c in cells if c)}</row>")
        else:
            cells = [f'<c r="A{rn}" t="s"><v>{sidx(plant)}</v></c>',
                     f'<c r="B{rn}" s="1"><v>{mw}</v></c>']
            if note is not None:
                cells.append(f'<c r="C{rn}" t="inlineStr">'
                             f"<is><t>{esc(note)}</t></is></c>")
            elif i % 9 == 0:
                cells.append(f'<c r="C{rn}" s="2"/>')  # style-only blank
            cells.append(f'<c r="D{rn}" t="b"><v>{1 if flag else 0}</v></c>')
            cells.append(f'<c r="E{rn}"><f>ROW()*2-3</f>'
                         f"<v>{serial}</v></c>")
            if extra is not None:
                cells.append(f'<c r="F{rn}" t="inlineStr">'
                             f"<is><t>{esc(extra)}</t></is></c>")
            out.append(f'<row r="{rn}">{"".join(cells)}</row>')
    out.append(f'<row r="{len(ROWS) + 2}"/>')  # fully empty row
    out.append("</sheetData></worksheet>")
    return "".join(out)


def meta_sheet_xml():
    out = [f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<worksheet xmlns="{NS}"><sheetData>']
    out.append('<row r="1"><c r="A1" t="inlineStr"><is><t>key</t></is></c>'
               '<c r="B1" t="inlineStr"><is><t>value</t></is></c></row>')
    out.append('<row r="2"><c r="A2" t="inlineStr"><is><t>source</t></is>'
               '</c><c r="B2" t="inlineStr"><is>'
               "<t>independent-writer fixture</t></is></c></row>")
    out.append('<row r="3"><c r="A3" t="inlineStr"><is><t>rows</t></is></c>'
               f'<c r="B3"><v>{len(ROWS)}</v></c></row>')
    out.append("</sheetData></worksheet>")
    return "".join(out)


def workbook_xml():
    # non-sequential rIds; 'meta' listed FIRST but data's sheetId is 1
    return (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{NS}" xmlns:r="{NSR}"><sheets>'
            f'<sheet name="meta" sheetId="2" r:id="rId7"/>'
            f'<sheet name="data" sheetId="1" r:id="rId3"/>'
            f"</sheets></workbook>")


def workbook_rels():
    # rId3 -> a non-canonical part name; rId7 -> absolute (/xl/...) path
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'styles" Target="styles.xml"/>'
            '<Relationship Id="rId3" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'worksheet" Target="worksheets/sheet99.xml"/>'
            '<Relationship Id="rId7" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'worksheet" Target="/xl/worksheets/meta7.xml"/>'
            '<Relationship Id="rId9" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'sharedStrings" Target="sharedStrings.xml"/>'
            "</Relationships>")


def content_types():
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/'
            '2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet99.xml" ContentType'
            '="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            '<Override PartName="/xl/worksheets/meta7.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            '<Override PartName="/xl/sharedStrings.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.sharedStrings+xml"/>'
            '<Override PartName="/xl/styles.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.styles+xml"/>'
            "</Types>")


def root_rels():
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>")


def styles_xml():
    return (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<styleSheet xmlns="{NS}">'
            '<numFmts count="1"><numFmt numFmtId="164" '
            'formatCode="#,##0.00"/></numFmts>'
            '<cellXfs count="3"><xf numFmtId="0"/>'
            '<xf numFmtId="164" applyNumberFormat="1"/>'
            '<xf numFmtId="0" applyFill="1"/></cellXfs></styleSheet>')


def main():
    with zipfile.ZipFile(XLSX, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types())
        z.writestr("_rels/.rels", root_rels())
        z.writestr("docProps/app.xml",
                   '<?xml version="1.0"?><Properties xmlns="http://'
                   "schemas.openxmlformats.org/officeDocument/2006/"
                   'extended-properties"><Application>handmade'
                   "</Application></Properties>")
        z.writestr("xl/workbook.xml", workbook_xml())
        z.writestr("xl/_rels/workbook.xml.rels", workbook_rels())
        z.writestr("xl/styles.xml", styles_xml())
        z.writestr("xl/sharedStrings.xml", shared_strings_xml())
        z.writestr("xl/worksheets/sheet99.xml", data_sheet_xml())
        z.writestr("xl/worksheets/meta7.xml", meta_sheet_xml())

    # ---- goldens from THIS script's arithmetic, never file readback --
    mw_total_q = sum(r[1] for r in ROWS)  # exact, quarter-MW units
    golden = {
        "n_data_rows": len(ROWS) + 1,  # + the trailing empty row
        "header": HEADER,
        "sheet_names_in_workbook_order": ["meta", "data"],
        "mw_sum_quarters": mw_total_q,
        "plant_nonnull": len(ROWS),
        "note_nonnull": sum(1 for r in ROWS if r[2] is not None),
        "flag_true": sum(1 for r in ROWS if r[3]),
        "serial_sum": sum(r[4] for r in ROWS),
        "extra_nonnull": sum(1 for r in ROWS if r[5] is not None),
        "rich_text_plant": "Wind & See",
        "rich_text_count": sum(1 for r in ROWS if r[0] == "Wind & See"),
        "trailing_space_plant": "trailing space ",
        "trailing_space_count": sum(
            1 for r in ROWS if r[0] == "trailing space "),
        "unicode_count": sum(1 for r in ROWS if r[0] == "水力"),
        "row0": {"plant": ROWS[0][0],
                 "mw": f"{ROWS[0][1] // 4}.{ROWS[0][1] % 4 * 25:02d}"
                       .rstrip("0").rstrip("."),
                 "flag": "1" if ROWS[0][3] else "0",
                 "serial": str(ROWS[0][4])},
        "meta_rows": 2,
    }
    with open(GOLDEN, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print("wrote", XLSX, os.path.getsize(XLSX), "bytes;",
          len(sst), "shared strings; mw_sum_quarters", mw_total_q)


if __name__ == "__main__":
    main()
