"""Document-level layout analysis (furniture classification).

A focused port of the reference's analyzeLayout 3-phase design
(/root/reference/js/import/analyzeLayout.js:16-3454) covering the
furniture roles — the cross-page rules that fundamentally require the
whole document in one pass (exactly why the Spark wrapper groups by
url, SURVEY.md §2.5):

- Phase 1: per-line features (band position, digit-stripped text key,
  lone-number detection).
- Phase 2: document model — normalized text keys recurring in the top
  (or bottom) 8% band on at least half the pages are running
  headers/footers; lone numbers whose value tracks the page index with
  a constant offset across a run of pages are folios.
- Phase 3: role assignment per paragraph: 'header' / 'footer' /
  'pagenum', with the reference's single-page fallback (a lone number
  in the margin band is a folio even without a sequence).

Title detection: a paragraph whose dominant font size is >= 1.5x the
document body size on page 0's top half -> 'title' (analyzeLayout's
size-ratio rule, simplified).
"""

from __future__ import annotations

import re

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


def analyze_layout_doc(pages: list[OcrPage]) -> None:
    """Assign furniture roles to paragraphs across the document.
    Mutates par.type in place; paragraphs must already be assigned."""
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

    # Phase 3: role assignment.
    for page in pages:
        page_h = page.dims["height"]
        for par_i, par in enumerate(page.pars):
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
            # Footnote: paragraph opening with a superscript reference
            # marker (the reflow pass already breaks on it —
            # reflowPars.js:134-138; classifyRole promotes the role).
            first_word = words[0] if words else None
            if (first_word is not None and first_word.style.sup
                    and min(l.bbox.top for l in par.lines) > page_h * 0.5):
                par.type = "footnote"
                continue
            if band is not None and (band, _text_key(par)) in recurring:
                par.type = "header" if band == "top" else "footer"
                continue
            if (body_size and page.n == 0 and par_i == 0
                    and min(l.bbox.top for l in par.lines) < page_h * 0.5):
                par_sizes = [w.style.size for w in words if w.style.size]
                if par_sizes and max(par_sizes) >= body_size * 1.5:
                    par.type = "title"


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
