"""PDF-side table detection (minimal core of detectPdfTables).

The reference's detector (/root/reference/js/pdf/detectPdfTables.js,
4.2k LoC) layers many candidate generators; SURVEY.md §2.5 sanctions
the minimal core reimplemented here:

- path classification into thin horizontal / vertical rule lines
  (classifyPaths, :1139 — M/L subpath extents, same thresholds as the
  underline extractor but both axes);
- strict-grid detection (tryDetectStrictGrid, :2298): clustered rule
  ys and xs where the verticals span the horizontal band and vice
  versa -> table bbox + interior column separators;
- right-clustered numeric row clustering (isRightClusteredNumeric,
  :14-28 + the Phase-0 dot-leader cluster rule, :66-100): >= 3 rows
  whose trailing tokens are >= 3 numeric words, within a 300 px
  vertical window, form a borderless table candidate.

The 20k-path page cap (:5) is kept. Cell extraction reuses the
OCR-side ``extract_table_rows`` (utils/detectTables.js semantics).
"""

from __future__ import annotations

import re

from ...model import Bbox

MAX_TABLE_DETECTION_PATHS = 20000
_NUM_TOKEN_RE = re.compile(r"^[\d,$%.()+-]+$")
_DIGIT_RE = re.compile(r"\d")


def is_num_token(t: str) -> bool:
    return bool(_NUM_TOKEN_RE.match(t))


def is_num_word(t: str) -> bool:
    return is_num_token(t) and (bool(_DIGIT_RE.search(t)) or t == "-")


def is_right_clustered_numeric(words) -> bool:
    """Label followed by >= 3 right-clustered numeric tokens
    (detectPdfTables.js:14-28)."""
    if len(words) < 4:
        return False
    num_w = sum(1 for w in words if is_num_word(w.text))
    if num_w < 3:
        return False
    last_text_idx = -1
    for i, w in enumerate(words):
        if not is_num_token(w.text):
            last_text_idx = i
    num_after_text = 0
    for w in words[last_text_idx + 1:]:
        if not is_num_token(w.text):
            return False
        if is_num_word(w.text):
            num_after_text += 1
    return num_after_text >= 3


def classify_rule_lines(paths, scale: float, page_h_pts: float):
    """Painted-path M/L subpath extents -> thin horizontal and vertical
    rule lines in the scaled top-left frame (classifyPaths core)."""
    h_lines, v_lines = [], []
    for path in paths:
        if not path.fill and not path.stroke:
            continue
        subpaths = []
        for c in path.commands:
            if c[0] == "M":
                subpaths.append([(c[1], c[2])])
            elif c[0] == "L" and subpaths:
                subpaths[-1].append((c[1], c[2]))
        for pts in subpaths:
            if len(pts) < 2:
                continue
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            w = max(xs) - min(xs)
            h = max(ys) - min(ys)
            if h < 2 and w > 10:
                h_lines.append({
                    "left": min(xs) * scale, "right": max(xs) * scale,
                    "y": (page_h_pts - max(ys)) * scale})
            elif w < 2 and h > 10:
                v_lines.append({
                    "x": min(xs) * scale,
                    "top": (page_h_pts - max(ys)) * scale,
                    "bottom": (page_h_pts - min(ys)) * scale})
    return h_lines, v_lines


def _cluster(values, tol: float) -> list[float]:
    out: list[list[float]] = []
    for v in sorted(values):
        if out and v - out[-1][-1] <= tol:
            out[-1].append(v)
        else:
            out.append([v])
    return [sum(c) / len(c) for c in out]


def detect_strict_grids(h_lines, v_lines) -> list[dict]:
    """Full ruled grids (tryDetectStrictGrid core): >= 3 horizontal rule
    positions and >= 2 verticals that span the horizontal band."""
    if len(h_lines) < 3 or len(v_lines) < 2:
        return []
    ys = _cluster([h["y"] for h in h_lines], 3)
    xs = _cluster([v["x"] for v in v_lines], 3)
    if len(ys) < 3 or len(xs) < 2:
        return []
    top, bottom = ys[0], ys[-1]
    left, right = xs[0], xs[-1]
    # verticals must span the band; horizontals must span the width
    spanning = [
        v for v in v_lines
        if v["top"] <= top + 5 and v["bottom"] >= bottom - 5]
    wide = [
        h for h in h_lines
        if h["left"] <= left + 5 and h["right"] >= right - 5]
    if len(_cluster([v["x"] for v in spanning], 3)) < 2 or len(wide) < 3:
        return []
    seps = _cluster([v["x"] for v in spanning], 3)[1:-1]
    return [{
        "bbox": Bbox(left, top, right, bottom),
        "col_separators": seps,
        "method": "grid",
    }]


def group_lines_into_rows(lines, tol: float = 5.0) -> list[list]:
    """Visual rows from top-proximity (groupLinesIntoRows, :881) — the
    PDF line-cut machine emits one OcrLine per cell at wide column
    gaps, so the numeric test must run on the reassembled row."""
    rows: list[dict] = []
    for line in sorted(lines, key=lambda l: l.bbox.top):
        for row in rows:
            if abs(line.bbox.top - row["top"]) <= tol:
                row["lines"].append(line)
                row["top"] = min(row["top"], line.bbox.top)
                break
        else:
            rows.append({"top": line.bbox.top, "lines": [line]})
    return [r["lines"] for r in rows]


def detect_numeric_clusters(page, exclude_bboxes=()) -> list[dict]:
    """Borderless dot-leader / financial-row tables: clusters of >= 3
    right-clustered-numeric visual rows within a 300 px window. Rows
    inside ``exclude_bboxes`` (already-detected ruled grids) don't seed
    or chain clusters."""

    def _inside_excluded(row_lines) -> bool:
        top = min(l.bbox.top for l in row_lines)
        bot = max(l.bbox.bottom for l in row_lines)
        mid = (top + bot) / 2
        return any(b.top <= mid <= b.bottom for b in exclude_bboxes)

    numeric_rows = []
    for row_lines in group_lines_into_rows(page.lines):
        if _inside_excluded(row_lines):
            continue
        words = sorted(
            (w for line in row_lines for w in line.words),
            key=lambda w: w.bbox.left)
        if is_right_clustered_numeric(words):
            numeric_rows.append(row_lines)
    out = []
    cluster: list = []
    for row_lines in numeric_rows:
        top = min(l.bbox.top for l in row_lines)
        if cluster and top - cluster[-1][0] > 300:
            if len(cluster) >= 3:
                out.append(cluster)
            cluster = []
        cluster.append((top, row_lines))
    if len(cluster) >= 3:
        out.append(cluster)
    tables = []
    for rows in out:
        lines = [l for _, row_lines in rows for l in row_lines]
        tables.append({
            "bbox": Bbox(
                min(l.bbox.left for l in lines),
                min(l.bbox.top for l in lines),
                max(l.bbox.right for l in lines),
                max(l.bbox.bottom for l in lines)),
            "col_separators": [],
            "method": "numeric",
        })
    return tables


def detect_pdf_table_regions(page, paths, scale: float,
                             page_h_pts: float) -> list[dict]:
    """Composite PDF-side detector: strict ruled grids first, then
    borderless numeric clusters that don't overlap a grid."""
    if len(page.lines) < 3:
        return []
    if len(paths) > MAX_TABLE_DETECTION_PATHS:
        paths = []
    h_lines, v_lines = classify_rule_lines(paths, scale, page_h_pts)
    tables = detect_strict_grids(h_lines, v_lines)

    def overlaps(a: Bbox, b: Bbox) -> bool:
        return not (a.right < b.left or b.right < a.left
                    or a.bottom < b.top or b.bottom < a.top)

    for cand in detect_numeric_clusters(
            page, [t["bbox"] for t in tables]):
        if not any(overlaps(cand["bbox"], t["bbox"]) for t in tables):
            tables.append(cand)
    tables.sort(key=lambda t: t["bbox"].top)
    return tables
