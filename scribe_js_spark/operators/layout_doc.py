"""Document-level layout analysis: the full analyzeLayout rule set.

A from-scratch implementation of the reference's analyzeLayout
3-phase design (/root/reference/js/import/analyzeLayout.js:16-3454) —
the cross-page rules that fundamentally require the whole document in
one pass (exactly why the Spark wrapper groups by url, SURVEY.md
§2.5). What lives here:

- Phase 1: per-line features (band position, digit-stripped text key,
  lone-number detection).
- Phase 2: document model — normalized text keys recurring in the top
  (or bottom) 8% band on at least half the pages are running
  headers/footers; lone numbers (arabic or roman, roman_to_int) whose
  value tracks the page index with a constant offset across a run of
  pages are folios.
- Phase 3: role assignment per paragraph: 'header' / 'footer' /
  'pagenum' / 'title' / 'heading' / 'blockquote' / 'listItem' /
  'tocEntry', with the reference's single-page fallback (a lone
  number in the margin band is a folio even without a sequence) and
  struct-tree corroboration when PDF structure tags are present
  (_par_struct_tag).

Beyond furniture roles, the rest of the analyzeLayout surface:
- List detection: line_enumerator recognizes bullet / arabic / roman /
  alpha enumerators, detect_numbering_schemes fits document-wide
  schemes, split_pars_at_enumerators breaks merged paragraphs at
  enumerator heads.
- TOC pages: split_toc_pages detects dot-leader/right-aligned-number
  lines and splits them into per-entry paragraphs.
- Line-number columns (legal transcripts): _detect_line_number_columns
  handles case A (separate margin column) and case B (numbers glued to
  the text line head) against a median body size.
- Columns: cluster_peaks + detect_column_count estimate per-page
  column layout from paragraph left-edge clustering.
- collect_par_roles flattens the per-paragraph roles for the driver
  oracle (furniture_roles / layout_roles2 / struct_layout_roles /
  toc_entries / list_items / linenum_caseb / column_counts queries).
"""

from __future__ import annotations

import re
import unicodedata

from ..model import OcrPage

TOP_BAND = 0.08
BOTTOM_BAND = 0.92

_DIGITS_RE = re.compile(r"[0-9]+")
_ROMAN_RE = re.compile(r"^[ivxlcdm]+$", re.I)
_FOLIO_RE = re.compile(r"^-?\s*([0-9]+|[ivxlcdm]+)\s*-?$", re.I)


def _text_key(par) -> str:
    """Digit-stripped normalized paragraph key (the reference's sigKey:
    digits are stripped so 'Page 3' and 'Page 4' share a key)."""
    text = " ".join(
        w.text for line in par.lines for w in line.words)
    key = _DIGITS_RE.sub("", text.lower())
    return re.sub(r"\s+", " ", key).strip()


def _band(par, page_h: float) -> str | None:
    top = min(l.bbox.top for l in par.lines)
    bottom = max(l.bbox.bottom for l in par.lines)
    if bottom <= page_h * TOP_BAND * 2 and top <= page_h * TOP_BAND:
        return "top"
    if top >= page_h * BOTTOM_BAND:
        return "bottom"
    return None


def _lone_number(par) -> int | None:
    words = [w for line in par.lines for w in line.words]
    if len(words) != 1:
        return None
    m = _FOLIO_RE.match(words[0].text)
    if not m:
        return None
    tok = m.group(1)
    if tok.isdigit():
        return int(tok)
    return None  # roman folios tracked as generic pagenum below


def _par_struct_tag(page_n: int, par, struct_tags: dict) -> str | None:
    """Char-weighted dominant structure tag of a paragraph, resolved
    only when >= 0.6 of the chars sit in that element
    (analyzeLayout.js:76-91 structResolved)."""
    weights: dict[str, int] = {}
    n_char = 0
    for line in par.lines:
        for w in line.words:
            wl = len(w.text)
            n_char += wl
            if w.mcid is not None:
                tag = struct_tags.get((page_n, w.mcid))
                if tag:
                    weights[tag] = weights.get(tag, 0) + wl
    if not weights or n_char == 0:
        return None
    tag, best = max(weights.items(), key=lambda kv: kv[1])
    return tag if best / n_char >= 0.6 else None


def analyze_layout_doc(pages: list[OcrPage],
                       outline_headings: dict | None = None,
                       struct_tags: dict | None = None) -> None:
    """Assign furniture roles to paragraphs across the document.
    Mutates par.type in place; paragraphs must already be assigned.
    ``outline_headings`` (page index -> set of normalized bookmark
    titles, from build_outline_heading_index) names headings that
    classifyRole cannot detect — same size and weight as body text
    (analyzeLayout.js:1783-1787). ``struct_tags`` ((page index, mcid)
    -> block tag, from build_struct_elem_map) corroborates roles on
    tagged PDFs: TD/TH/LI pin body (analyzeLayout.js:2905, 2970),
    BlockQuote/Quote promote blockquote without the geometric inset
    (:2219, 2234)."""
    n_pages = len(pages)
    if n_pages == 0:
        return

    # Phase 1/2: recurring band keys.
    band_keys: dict[tuple, set] = {}
    for page in pages:
        page_h = page.dims["height"]
        for par in page.pars:
            band = _band(par, page_h)
            if band is None:
                continue
            key = _text_key(par)
            if len(key) >= 3:  # skip folios/trivial marks (ref :1135)
                band_keys.setdefault((band, key), set()).add(page.n)

    recurring = {
        bk for bk, page_set in band_keys.items()
        if len(page_set) >= max(2, (n_pages + 1) // 2)
    }

    # Phase 2: folio sequences — value minus page index constant on a
    # run of >= 2 pages.
    folio_offsets: dict[int, int] = {}
    for page in pages:
        page_h = page.dims["height"]
        for par in page.pars:
            if _band(par, page_h) is None:
                continue
            val = _lone_number(par)
            if val is not None:
                off = val - page.n
                folio_offsets[off] = folio_offsets.get(off, 0) + 1
    seq_offsets = {off for off, n in folio_offsets.items() if n >= 2}

    # Document body font size (for title promotion).
    sizes = [
        w.style.size
        for page in pages for line in page.lines for w in line.words
        if w.style.size
    ]
    body_size = None
    if sizes:
        sizes.sort()
        body_size = sizes[len(sizes) // 2]

    # Line-number columns (case A standalone core,
    # analyzeLayout.js:189-326): mark word.lineNum on locked columns.
    ln_body_size = body_size or _median_line_height(pages) or 10.0
    _detect_line_number_columns(pages, ln_body_size)

    # Phase 3: role assignment.
    for page in pages:
        page_h = page.dims["height"]
        for par_i, par in enumerate(page.pars):
            # A paragraph whose every line is a locked line number is
            # margin furniture dropped from reflow ('linenum' role) —
            # checked first so the lone-number folio fallback cannot
            # claim a short column.
            par_words = [w for line in par.lines for w in line.words]
            if par_words and all(w.lineNum for w in par_words):
                par.type = "linenum"
                continue
            band = _band(par, page_h)
            val = _lone_number(par)
            words = [w for line in par.lines for w in line.words]
            if val is not None and band is not None:
                if (val - page.n) in seq_offsets or n_pages == 1:
                    par.type = "pagenum"
                    par.parNum = str(val)
                    continue
                # single lone number in a margin band (fallback,
                # ref :1236-1244)
                par.type = "pagenum"
                par.parNum = str(val)
                continue
            if (len(words) == 1 and band is not None
                    and _ROMAN_RE.match(words[0].text)):
                par.type = "pagenum"
                par.parNum = words[0].text
                continue
            if band is not None and (band, _text_key(par)) in recurring:
                par.type = "header" if band == "top" else "footer"
                continue
            struct_tag = (_par_struct_tag(page.n, par, struct_tags)
                          if struct_tags else None)
            # A producer-tagged table cell is body BEFORE the footnote
            # rules, which would otherwise type a wide data table's
            # small, low, columnar cells as flush-left footnotes
            # (analyzeLayout.js:2905). Folio rules above still win.
            if struct_tag in ("TD", "TH"):
                continue
            # Footnote: paragraph opening with a superscript reference
            # marker (the reflow pass already breaks on it —
            # reflowPars.js:134-138; classifyRole promotes the role).
            first_word = words[0] if words else None
            if (first_word is not None and first_word.style.sup
                    and min(l.bbox.top for l in par.lines) > page_h * 0.5):
                par.type = "footnote"
                continue
            # A list item's bold/large lead term must not promote to a
            # heading and split from its definition
            # (analyzeLayout.js:2970).
            if struct_tag == "LI":
                continue
            if (body_size and page.n == 0 and par_i == 0
                    and min(l.bbox.top for l in par.lines) < page_h * 0.5):
                par_sizes = [w.style.size for w in words if w.style.size]
                if par_sizes and max(par_sizes) >= body_size * 1.5:
                    par.type = "title"

    # Outline-anchored heading promotion (analyzeLayout.js:1783-1787):
    # bookmarks name headings classifyRole cannot detect. The
    # reference promotes the matching LINE; paragraphs here are
    # already grouped, so a body paragraph whose full text matches is
    # promoted whole, and one whose FIRST line matches is split at the
    # role boundary the reference's later grouping would create.
    if outline_headings:
        from ..model import OcrPar, bbox_union
        from .pdf.outline import normalize_heading_text

        for page in pages:
            anchors = outline_headings.get(page.n)
            if not anchors:
                continue
            new_pars = []
            for par in page.pars:
                if par.type != "body" or not par.lines:
                    new_pars.append(par)
                    continue
                full = normalize_heading_text(" ".join(
                    " ".join(w.text for w in line.words)
                    for line in par.lines))
                first = normalize_heading_text(" ".join(
                    w.text for w in par.lines[0].words))
                if full in anchors:
                    par.type = "heading"
                    new_pars.append(par)
                elif first in anchors and len(par.lines) > 1:
                    head = OcrPar(page, par.lines[0].bbox.copy())
                    head.lines = [par.lines[0]]
                    head.type = "heading"
                    head.reason = "outline anchor"
                    par.lines = par.lines[1:]
                    par.bbox = bbox_union([l.bbox for l in par.lines])
                    new_pars.append(head)
                    new_pars.append(par)
                else:
                    new_pars.append(par)
            page.pars = new_pars

    # Block-quote re-tag (analyzeLayout.js:2212-2235): a body paragraph
    # of >= 2 lines inset on BOTH sides against the document body
    # margins by more than 3.5% of the column width, with the two
    # insets within 6% of each other.
    body_lines = [
        line
        for page in pages for par in page.pars if par.type == "body"
        for line in par.lines if line.words]
    if body_lines:
        tol = ln_body_size * 0.6
        left_peaks = cluster_peaks([l.bbox.left for l in body_lines], tol)
        right_peaks = cluster_peaks(
            [l.bbox.right for l in body_lines], tol)
        body_left = left_peaks[0][0]
        body_right = right_peaks[0][0]
        col_width = body_right - body_left
        if col_width > 0:
            for page in pages:
                for par in page.pars:
                    if par.type != "body":
                        continue
                    # A producer-tagged BlockQuote/Quote promotes
                    # without the geometric inset — on a quote-dense
                    # page the most-common left is itself the quote
                    # margin (analyzeLayout.js:2213-2234).
                    if (struct_tags and _par_struct_tag(
                            page.n, par, struct_tags)
                            in ("BlockQuote", "Quote")):
                        par.type = "blockquote"
                        continue
                    if len(par.lines) < 2:
                        continue
                    p_left = min(l.bbox.left for l in par.lines)
                    p_right = max(l.bbox.right for l in par.lines)
                    li = p_left - body_left
                    ri = body_right - p_right
                    if (li > col_width * 0.035 and ri > col_width * 0.035
                            and abs(li - ri) < col_width * 0.06):
                        par.type = "blockquote"

    # Enumerated lists: split body paragraphs at active numbering-
    # scheme markers (bullets, (a)/(1)/[n]/"n."/Section forms).
    split_pars_at_enumerators(pages)
    # Dense TOC/index pages: one paragraph per entry.
    split_toc_pages(pages)


_ROMAN_VALS = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500,
               "m": 1000}


def roman_to_int(s: str) -> int:
    total = 0
    prev = 0
    for ch in reversed(s.lower()):
        v = _ROMAN_VALS.get(ch, 0)
        if v < prev:
            total -= v
        else:
            total += v
            prev = v
    return total


_BULLET_RE = re.compile(r"^[•◦▪▫●○◼◻➢»■□◾◽▶▸‣➤➔–—-]$")


def line_enumerator(line) -> dict | None:
    """Marker scheme opening a line (analyzeLayout.js lineEnumerator,
    :3248-3310): sup-ref raised digits, the FN+number convention,
    Section/Article headers, paren/bracket/dot numbered forms,
    alpha/roman variants, and repeated bullet glyphs."""
    words = line.words
    w0 = words[0].text if words else ""
    w1 = words[1].text if len(words) > 1 else ""
    if words and words[0].style.sup and re.match(r"^\d{1,3}$", w0):
        return {"scheme": "sup-ref", "value": int(w0), "raw": w0}
    m = re.match(r"^FN(\d{1,3})[.)]?$", w0)
    if m:
        return {"scheme": "sup-ref", "value": int(m.group(1)), "raw": w0}
    if re.match(r"^(Sec\.?|SEC\.?|Section|SECTION|Article|ARTICLE|§)$",
                w0):
        nm = re.match(r"^(\d{1,4})", w1)
        if nm:
            return {"scheme": "section", "value": int(nm.group(1)),
                    "raw": f"{w0} {w1}".strip()}
        rm = re.match(r"^([ivxlcdm]+)[.)]?$", w1, re.I)
        if rm:
            return {"scheme": "section",
                    "value": roman_to_int(rm.group(1)),
                    "raw": f"{w0} {w1}".strip()}
        return None
    m = re.match(r"^\((\d{1,3}|[a-z]{1,3}|[ivxlcdm]+)\)$", w0, re.I)
    if m:
        inner = m.group(1)
        if inner.isdigit():
            return {"scheme": "paren-num", "value": int(inner),
                    "raw": w0}
        if re.match(r"^[ivxlcdm]+$", inner, re.I) and len(inner) > 1:
            return {"scheme": "paren-roman",
                    "value": roman_to_int(inner), "raw": w0}
        if re.match(r"^[a-z]$", inner, re.I):
            return {"scheme": "paren-alpha",
                    "value": ord(inner.lower()) - 96, "raw": w0}
        return {"scheme": "paren-alpha", "value": None, "raw": w0}
    m = re.match(r"^\[(\d{1,3})\]$", w0)
    if m:
        return {"scheme": "bracket-num", "value": int(m.group(1)),
                "raw": w0}
    m = re.match(r"^(\d{1,3})[.)]$", w0)
    if m:
        return {"scheme": "num-dot", "value": int(m.group(1)), "raw": w0}
    m = re.match(r"^([ivxlcdm]{2,})\)$", w0, re.I)
    if m:
        return {"scheme": "roman-paren",
                "value": roman_to_int(m.group(1)), "raw": w0}
    m = re.match(r"^([ivxlcdm]{2,})\.$", w0, re.I)
    if m:
        return {"scheme": "roman-dot",
                "value": roman_to_int(m.group(1)), "raw": w0}
    m = re.match(r"^([a-z])\)$", w0, re.I)
    if m:
        return {"scheme": "alpha-paren",
                "value": ord(m.group(1).lower()) - 96, "raw": w0}
    m = re.match(r"^([a-z])\.$", w0, re.I)
    if m:
        return {"scheme": "alpha-dot",
                "value": ord(m.group(1).lower()) - 96, "raw": w0}
    if _BULLET_RE.match(w0):
        return {"scheme": "bullet", "value": None, "raw": w0}
    # A lone symbol or control glyph counts as a bullet: a dingbat-font
    # marker, or a real bullet mangled by a corrupt ToUnicode into an
    # arbitrary non-ASCII codepoint (even a C1 control). Punctuation is
    # excluded (an opening curly quote can line-lead as its own word),
    # and the >= 0x80 floor keeps ASCII operators out
    # (analyzeLayout.js lineEnumerator, last branch).
    if len(w0) == 1 and ord(w0) >= 0x80:
        cat = unicodedata.category(w0)
        if cat[0] in ("S", "C"):
            return {"scheme": "bullet", "value": None, "raw": w0}
    return None


def detect_numbering_schemes(enums: list) -> dict:
    """Active document-wide enumeration schemes (analyzeLayout.js
    detectNumberingSchemes): a value belongs to a sequence when a
    numeric neighbor also occurs; strong marker forms activate at a
    2-run, weak ones at 3; bare-period schemes stay non-splittable;
    a bullet glyph activates at 3 repeats of the SAME glyph."""
    seq: dict = {}
    for e in enums:
        if e and e["value"] is not None:
            seq.setdefault(e["scheme"], []).append(e["value"])
    out: dict = {}
    for scheme, vals in seq.items():
        value_set = set(vals)
        seq_vals = {v for v in value_set
                    if v - 1 in value_set or v + 1 in value_set}
        asc = sorted(value_set)
        run = max_run = 1
        for i in range(1, len(asc)):
            if asc[i] == asc[i - 1] + 1:
                run += 1
                max_run = max(max_run, run)
            else:
                run = 1
        splittable = scheme not in ("alpha-dot", "roman-dot")
        strong = (scheme == "section" or scheme.startswith("paren-")
                  or scheme in ("alpha-paren", "roman-paren",
                                "bracket-num"))
        out[scheme] = {
            "active": splittable and max_run >= (2 if strong else 3),
            "max_run": max_run, "sequence_values": seq_vals}
    glyph_counts: dict = {}
    for e in enums:
        if e and e["scheme"] == "bullet":
            glyph_counts[e["raw"]] = glyph_counts.get(e["raw"], 0) + 1
    bullet_max = max(glyph_counts.values(), default=0)
    if bullet_max >= 3:
        out["bullet"] = {"active": True, "max_run": bullet_max,
                         "sequence_values": set()}
    return out


def split_pars_at_enumerators(pages) -> None:
    """Split body paragraphs at lines opening an ACTIVE enumeration
    marker whose value participates in the document sequence (bullets
    always, once their glyph scheme is active) — the enumerator
    paragraph-break rule of the reference's region pass. Runs after
    role assignment so furniture paragraphs are untouched."""
    all_enums = [
        line_enumerator(line)
        for page in pages for par in page.pars if par.type == "body"
        for line in par.lines]
    schemes = detect_numbering_schemes(all_enums)
    if not any(s["active"] for s in schemes.values()):
        return
    from ..model import OcrPar, bbox_union

    for page in pages:
        new_pars = []
        for par in page.pars:
            if par.type != "body" or len(par.lines) < 2:
                new_pars.append(par)
                continue
            groups: list[list] = [[par.lines[0]]]
            for line in par.lines[1:]:
                e = line_enumerator(line)
                sc = schemes.get(e["scheme"]) if e else None
                splits = bool(
                    sc and sc["active"]
                    and (e["scheme"] == "bullet"
                         or e["value"] in sc["sequence_values"]))
                if splits:
                    groups.append([line])
                else:
                    groups[-1].append(line)
            if len(groups) == 1:
                new_pars.append(par)
                continue
            for g in groups:
                np = OcrPar(page, bbox_union([l.bbox for l in g]))
                np.lines = g
                np.type = par.type
                for l in g:
                    l.par = np
                new_pars.append(np)
        page.pars = new_pars


_TOC_DOTS_RE = re.compile(r"(?:\.\s*){3,}\d{1,4}$")
_TOC_P_RE = re.compile(r"\bp{1,2}\.\s*\d{1,4}\.?$")
_TOC_SEE_RE = re.compile(r"\.\s+See\s+(?:also\s+)?[A-Z]")
_HAS_ALPHA_RE = re.compile(r"[A-Za-z]")


def _line_text(line) -> str:
    return " ".join(w.text for w in line.words)


def split_toc_pages(pages) -> None:
    """Dense index/TOC pages: when a page's substantive lines are
    >= 40% entry-like (dot leaders + page number, '... p. 684.' forms,
    'Headword. See Other.' cross-references; >= 6 lines considered),
    every entry-ending line closes its paragraph so each entry stands
    alone (the tocTagsFuseEntries gate, analyzeLayout.js:2841-2859,
    applied as a split since our sources carry no struct fusing)."""
    from ..model import OcrPar, bbox_union

    for page in pages:
        considered = 0
        entry_lines: set = set()
        for par in page.pars:
            if par.type != "body":
                continue
            for line in par.lines:
                t = _line_text(line).strip()
                if len(t) < 4:
                    continue
                considered += 1
                if (_TOC_DOTS_RE.search(t)
                        or (_HAS_ALPHA_RE.search(t)
                            and _TOC_P_RE.search(t))
                        or _TOC_SEE_RE.search(t)):
                    entry_lines.add(id(line))
        if considered < 6 or len(entry_lines) / considered < 0.4:
            continue
        new_pars = []
        for par in page.pars:
            if (par.type != "body" or len(par.lines) < 2
                    or not any(id(l) in entry_lines for l in par.lines)):
                new_pars.append(par)
                continue
            groups: list[list] = [[par.lines[0]]]
            for prev, line in zip(par.lines, par.lines[1:]):
                if id(prev) in entry_lines:  # an entry closes its par
                    groups.append([line])
                else:
                    groups[-1].append(line)
            if len(groups) == 1:
                new_pars.append(par)
                continue
            for g in groups:
                np = OcrPar(page, bbox_union([l.bbox for l in g]))
                np.lines = g
                np.type = par.type
                for l in g:
                    l.par = np
                new_pars.append(np)
        page.pars = new_pars


_LN_STANDALONE_RE = re.compile(r"^\d{1,3}[.)]?$")

# Line-number constants (analyzeLayout.js:190-200)
LN_LEFT_FRAC = 0.4
LN_GATE_RUN = 8     # doc enables the detector at this run length
LN_CONF_RUN = 6     # a page is confidently line-numbered at this run
LN_RESCUE_RUN = 4   # partial page rescued at a locked column
LN_MAX_RUN = 35     # case B only: longer merged columns read as tables
LN_MAX_START = 30   # line numbers start near 1; table indices high
LN_LOCK_PAGES = 3   # a column locks when it recurs on this many pages
LN_MAX_NUMFIRST = 0.5    # case B: numeric first content word -> table
LN_MIN_PITCHREG = 0.85   # case B: per-line pitch regularity floor
LN_CASEB_MIN_RIGHTFRAC = 0.35  # case B: members annotate wide prose
LN_CASEB_MIN_DENSITY = 0.6     # case B: members tag most span lines

_LN_LEADER = "·•∙⋅‧․"
_LN_LEADER_RE = re.compile(f"^[{_LN_LEADER}]+$")
_LN_INT_RE = re.compile(f"^[{_LN_LEADER}]*(\\d{{1,4}})[{_LN_LEADER}]*$")
_LN_NUMFIRST_RE = re.compile(r"^[\d.,$%()-]+$")


def _leading_line_number(line):
    """(value, prefix_words, standalone) when the line opens with an
    integer after optional leader glyphs (analyzeLayout.js
    leadingLineNumber, :3119-3131)."""
    words = line.words
    if not words:
        return None
    i = 0
    while i < len(words) and _LN_LEADER_RE.match(words[i].text.strip()):
        i += 1
    if i >= len(words):
        return None
    m = _LN_INT_RE.match(words[i].text.strip())
    if not m:
        return None
    pfx = i + 1
    while pfx < len(words) \
            and _LN_LEADER_RE.match(words[pfx].text.strip()):
        pfx += 1
    return {"value": int(m.group(1)), "prefix_words": pfx,
            "standalone": pfx >= len(words)}


def _median_line_height(pages) -> float:
    hs = sorted(
        l.bbox.bottom - l.bbox.top
        for page in pages for l in page.lines if l.words)
    return hs[len(hs) // 2] if hs else 0.0


def _detect_line_number_columns(pages, body_size: float) -> None:
    """Line-number columns, both cases (analyzeLayout.js:205-326):
    case A standalone — per page the longest incrementing run
    (step <= 5) of left-margin integer-only lines at one x, with the
    document gate, per-page confidence, cross-page column lock,
    one-page rescue window and doc-wide value cap; case B merged
    prefixes (the number leads a body line) with the extra
    discrimination below — run-length cap, numeric-first-word table
    veto, pitch regularity, right-extent and density floors
    (LN_MAX_RUN..LN_CASEB_MIN_DENSITY)."""
    ln_max_indent = body_size * 2
    page_runs: dict[int, dict] = {}
    gate_fired = False
    for page in pages:
        page_w = page.dims.get("width") or 0
        if not page_w:
            continue
        left_edge = page_w * LN_LEFT_FRAC
        cands = []
        for line in page.lines:
            if line.bbox.left >= left_edge:
                continue
            lead = _leading_line_number(line)
            if not lead:
                continue
            cands.append({
                "line": line,
                "value": lead["value"],
                "prefix_words": lead["prefix_words"],
                "standalone": lead["standalone"],
                "x": line.bbox.left, "top": line.bbox.top})
        if len(cands) < LN_RESCUE_RUN:
            continue
        best_run: list = []
        for center, _cnt in cluster_peaks([c["x"] for c in cands],
                                          body_size):
            col = sorted(
                (c for c in cands if abs(c["x"] - center) <= body_size),
                key=lambda c: c["top"])
            cur: list = []
            for c in col:
                prev = cur[-1] if cur else None
                if prev and prev["value"] < c["value"] \
                        <= prev["value"] + 5:
                    cur.append(c)
                else:
                    cur = [c]
                if len(cur) > len(best_run):
                    best_run = list(cur)
        if len(best_run) < LN_RESCUE_RUN:
            continue
        xs = sorted(c["x"] for c in best_run)
        col_x = xs[len(xs) // 2]
        member_lines = {id(c["line"]) for c in best_run}
        prose_lefts = [
            l.bbox.left for l in page.lines
            if id(l) not in member_lines
            and (l.bbox.right - l.bbox.left) > body_size * 8]
        if prose_lefts:
            peaks = cluster_peaks(prose_lefts, body_size * 0.6)
            page_body_left = peaks[0][0]
        else:
            page_body_left = col_x
        indent_ok = col_x <= page_body_left + ln_max_indent
        body_lines = [
            l for l in page.lines if id(l) not in member_lines
            and any(re.search(r"[A-Za-z]", w.text) for w in l.words)]
        body_bottom = (max(l.bbox.top for l in body_lines)
                       if body_lines else float("inf"))
        body_overlap = (len(body_lines) < 4
                        or any(c["top"] <= body_bottom
                               for c in best_run))
        sa_frac = (sum(1 for c in best_run if c["standalone"])
                   / len(best_run))
        ln_like_core = (
            best_run[0]["value"] <= LN_MAX_START
            and (sa_frac >= 0.5 or len(best_run) <= LN_MAX_RUN))
        if ln_like_core and sa_frac < 0.5:
            # Case B (merged prefix) extra discrimination
            # (analyzeLayout.js:260-276): a data-table index column or
            # a numbered list resembles merged line numbers.
            num_first = have_content = 0
            for c in best_run:
                ws = c["line"].words
                if c["prefix_words"] >= len(ws):
                    continue
                fw = ws[c["prefix_words"]].text
                have_content += 1
                if re.search(r"\d", fw) \
                        and _LN_NUMFIRST_RE.match(fw.strip()):
                    num_first += 1
            numeric_first_frac = (num_first / have_content
                                  if have_content else 0.0)
            tops = [c["top"] for c in best_run]
            gaps = [tops[k] - tops[k - 1] for k in range(1, len(tops))]
            med_gap = sorted(gaps)[len(gaps) // 2] if gaps else 1.0
            pitch_reg = (
                sum(1 for g in gaps
                    if 0.5 * med_gap <= g <= 1.75 * med_gap) / len(gaps)
                if gaps else 1.0)
            rights = sorted(c["line"].bbox.right for c in best_run)
            med_right_frac = rights[len(rights) // 2] / page_w
            span_top, span_bot = tops[0], tops[-1]
            lines_in_span = sum(
                1 for l in page.lines
                if span_top - 1 <= l.bbox.top <= span_bot + 1)
            density = (len(best_run) / lines_in_span
                       if lines_in_span else 1.0)
            ln_like_core = (
                numeric_first_frac < LN_MAX_NUMFIRST
                and pitch_reg >= LN_MIN_PITCHREG
                and med_right_frac >= LN_CASEB_MIN_RIGHTFRAC
                and density >= LN_CASEB_MIN_DENSITY)
        ln_like = ln_like_core and indent_ok and body_overlap
        page_runs[page.n] = {
            "run": len(best_run), "members": best_run, "col_x": col_x,
            "ln_like": ln_like, "indent_ok": indent_ok,
            "cands": cands, "start": best_run[0]["value"]}
        if len(best_run) >= LN_GATE_RUN and ln_like:
            gate_fired = True

    if not gate_fired:
        return
    recur = [
        (p, r) for p, r in page_runs.items()
        if r["run"] >= LN_CONF_RUN and r["start"] <= LN_MAX_START
        and r["indent_ok"]]
    ln_ceil = 0
    for r in page_runs.values():
        if r["ln_like"]:
            for c in r["members"]:
                ln_ceil = max(ln_ceil, c["value"])
    if not ln_ceil:
        ln_ceil = 28
    lock_peaks = [
        (center, cnt)
        for center, cnt in cluster_peaks(
            [r["col_x"] for _, r in recur], body_size)
        if cnt >= LN_LOCK_PAGES]
    for center, _cnt in lock_peaks:
        at_x = sorted(
            p for p, r in recur if abs(r["col_x"] - center) <= body_size)
        conf_min, conf_max = at_x[0] - 1, at_x[-1] + 1
        conf_set = set(at_x)
        for p, r in page_runs.items():
            if abs(r["col_x"] - center) > body_size:
                continue
            accept = p in conf_set or (
                r["run"] >= LN_RESCUE_RUN
                and r["start"] <= LN_MAX_START
                and conf_min <= p <= conf_max)
            if not accept:
                continue
            for c in r["cands"]:
                if abs(c["x"] - center) > body_size:
                    continue
                if 1 <= c["value"] <= ln_ceil:
                    if c["standalone"]:
                        for w in c["line"].words:
                            w.lineNum = True
                    else:
                        # case B: only the leading prefix words are the
                        # line number (analyzeLayout.js:310-312)
                        for w in c["line"].words[:c["prefix_words"]]:
                            w.lineNum = True


def cluster_peaks(values: list[float], tol: float) -> list[tuple]:
    """1-D peak clustering (the reference's clusterPeaks,
    analyzeLayout.js:3137): greedy nearest-cluster assignment within
    ``tol`` of the running cluster center. Returns (center, count),
    count-descending."""
    clusters: list[list] = []  # [sum, count]
    for v in sorted(values):
        for c in clusters:
            center = c[0] / c[1]
            if abs(v - center) <= tol:
                c[0] += v
                c[1] += 1
                break
        else:
            clusters.append([v, 1])
    out = [(c[0] / c[1], c[1]) for c in clusters]
    out.sort(key=lambda x: -x[1])
    return out


def detect_column_count(page: OcrPage) -> int:
    """Column count from body-line left-edge peaks (detectColumns,
    analyzeLayout.js:3171): peaks of prose left edges clustered at
    0.6x the body line height, kept when they carry at least
    max(2, 8%) of the lines."""
    lines = [l for l in page.lines if l.words]
    if not lines:
        return 0
    heights = sorted(l.bbox.bottom - l.bbox.top for l in lines)
    body_h = heights[len(heights) // 2]
    lefts = [l.bbox.left for l in lines]
    peaks = cluster_peaks(lefts, body_h * 0.6)
    min_count = max(2, int(len(lines) * 0.08))
    return sum(1 for _, count in peaks if count >= min_count) or 1


def collect_par_roles(pages: list[OcrPage]) -> list[dict]:
    rows = []
    for page in pages:
        for par_i, par in enumerate(page.pars):
            rows.append({
                "page_n": page.n,
                "par_n": par_i,
                "par_type": par.type,
                "par_num": par.parNum,
            })
    return rows
