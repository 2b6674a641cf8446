"""PDF-side table detection — the detectPdfTables phase ladder.

A from-scratch implementation of the reference's detector
(/root/reference/js/pdf/detectPdfTables.js, 4.2k LoC), phase by phase:

- Phase 0 quick bail-out (:72-100): zero same-top line pairs and no
  dot-leader cluster -> prose page, only path-based detection runs;
- Phase 1 table-like row identification (find_table_like_rows,
  :121-247): stream-consecutive multi-line rows with numbers or >= 3
  segments, single-line right-clustered-numeric rows, column-major
  pure-numeric fragment rows, index-gapped sub-row splitting;
- Phase 2 run/cluster grouping (group_rows_into_candidates,
  :908-1125): dynamic y threshold, section-header bridging, x-overlap
  union-find for side-by-side tables, cluster-local gap re-check;
- Phase 3 path classification (classify_rule_lines, :1139): merged
  rule lines with pre-merge ``segments``, achromatic filter, adaptive
  minimum rule width, row-band fills, header fills; dashed-line
  reconstitution (:1784-1864);
- Phase 3.5 row-band structure (extract_row_band_structure,
  :1542-1704) + candidate adoption / standalone >= 8-band tables
  (make_row_band_candidates, :802-878);
- Phase 4 validation (validate_candidate, :1914-2063): alignment,
  segment consistency, tiny-fragment / prose / narrative rejections;
  grid tables override overlapping text candidates;
- strict grids one-per-connected-rule-component (detect_strict_grids,
  :2169-2243) and segmented-hline tables (:2411, :3647) with break
  patterns as column separators;
- header-rule tables (detect_header_rule_tables, :3354-3594);
- Phase 5.55 'Table N' title scan (detect_table_title, :3775-3817);
- Phase 5.5/5.7-style header association + unruled column inference
  (detect_table_header, infer_unruled_columns);
- Phase 6 stream-order validation (validate_stream_order, :4018-4051).

The round-4 deviations are closed: Phase 2 candidates get the
reference's 3-row-height top expansion and a full refine_table_top
(Phase 5.5) re-shrink; row-band column anchors flow through
extract_structure (:2728-3093) with vLine-first correlation; and
detect_table_header carries Rules 1-2 plus the stacked-2-cell
strong-header path. The 20k-path page cap (:5) is kept. Cell
extraction reuses the OCR-side ``extract_table_rows``
(utils/detectTables.js semantics).
"""

from __future__ import annotations

import re

from ...model import Bbox

MAX_TABLE_DETECTION_PATHS = 20000
_NUM_TOKEN_RE = re.compile(r"^[\d,$%.()+-]+$")
_DIGIT_RE = re.compile(r"\d")
_TOTAL_RE = re.compile(r"^Total\b", re.I)


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


def merge_collinear_segments(items, pos_key: str, start_key: str,
                             end_key: str, tol: float = 5.0,
                             gap: float = 10.0) -> list[dict]:
    """mergeCollinearSegments (detectPdfTables.js:1717-1762): group by
    position within ``tol``, merge extent-adjacent pieces whose gap is
    <= ``gap``, and keep the pre-merge pieces under ``segments`` — a
    segmented grid encodes its column breaks there."""
    groups: list[dict] = []
    for seg in items:
        for g in groups:
            if abs(seg[pos_key] - g["pos"]) <= tol:
                g["segs"].append(seg)
                break
        else:
            groups.append({"pos": seg[pos_key], "segs": [seg]})
    out: list[dict] = []
    for g in groups:
        segs = sorted(g["segs"], key=lambda s: s[start_key])
        cur = dict(segs[0])
        parts = [{start_key: segs[0][start_key],
                  end_key: segs[0][end_key]}]
        for seg in segs[1:]:
            if seg[start_key] <= cur[end_key] + gap:
                if seg[end_key] > cur[end_key]:
                    cur[end_key] = seg[end_key]
                parts.append({start_key: seg[start_key],
                              end_key: seg[end_key]})
            else:
                cur["segments"] = parts
                out.append(cur)
                cur = dict(seg)
                parts = [{start_key: seg[start_key],
                          end_key: seg[end_key]}]
        cur["segments"] = parts
        out.append(cur)
    return out


def _achromatic(color) -> bool:
    """Achromatic (gray/black) color test (detectPdfTables.js:1162-1171)
    — chromatic chart/decoration paths must not form phantom grids."""
    if not color:
        return True
    if len(color) == 3:
        return max(color) - min(color) < 0.15
    if len(color) == 4:
        return color[0] < 0.15 and color[1] < 0.15 and color[2] < 0.15
    return True


def _row_band_color(color) -> bool:
    """Row-band fill colors: achromatic or light (isRowBandColor,
    detectPdfTables.js:1175-1180)."""
    if _achromatic(color):
        return True
    if color and len(color) == 3:
        return all(c >= 0.5 for c in color)
    return False


def classify_rule_lines(paths, scale: float, page_h_pts: float,
                        page=None):
    """Painted-path subpath extents -> merged thin horizontal/vertical
    rule lines (with pre-merge ``segments``) plus row-band fill rects
    and header-fill rects, in the scaled top-left frame (classifyPaths,
    detectPdfTables.js:1139).

    Returns (h_lines, v_lines, filled_rects, header_fills). Chromatic
    paths are excluded from rules; when ``page`` is given the minimum
    h-rule width adapts to the page's median line height (a cell border
    is at least one character wide, :1147-1153). ``filled_rects`` are
    the row-band-colored cell/stripe backgrounds (:1401-1409) that
    Phase 3.5 assembles into row-band regions."""
    min_w_pts = 10.0
    page_h_px = page_h_pts * scale
    if page is not None:
        hs = sorted(
            (ln.bbox.bottom - ln.bbox.top) / scale
            for ln in page.lines
            if 2 < (ln.bbox.bottom - ln.bbox.top) / scale < 100)
        if hs:
            min_w_pts = max(10.0, hs[len(hs) // 2])
    raw_h, raw_v, filled_rects, header_fills = [], [], [], []
    for path in paths:
        if not path.fill and not path.stroke:
            continue
        color = path.strokeColor if path.stroke else path.fillColor
        subpaths = []
        for c in path.commands:
            if c[0] == "M":
                subpaths.append([(c[1], c[2])])
            elif c[0] == "L" and subpaths:
                subpaths[-1].append((c[1], c[2]))
        all_pts = [p for pts in subpaths for p in pts]
        if path.fill and all_pts:
            xs = [p[0] for p in all_pts]
            ys = [p[1] for p in all_pts]
            w, h = max(xs) - min(xs), max(ys) - min(ys)
            rect = {
                "left": min(xs) * scale,
                "right": max(xs) * scale,
                "top": (page_h_pts - max(ys)) * scale,
                "bottom": (page_h_pts - min(ys)) * scale}
            # row-band cell/stripe background (:1401-1409)
            if w > min_w_pts and min_w_pts * 0.5 <= h < min_w_pts * 5 \
                    and _row_band_color(path.fillColor):
                filled_rects.append(rect)
                continue
            # header background fill (:1410-1421): a wide filled band
            # shorter than 30% of the page marks a header area
            if w > min_w_pts * 5 and min_w_pts * 3 <= h \
                    < page_h_pts * 0.3 and _achromatic(path.fillColor):
                header_fills.append(rect)
                continue
        if not _achromatic(color):
            continue
        for pts in subpaths:
            if len(pts) < 2:
                continue
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            w = max(xs) - min(xs)
            h = max(ys) - min(ys)
            if h < 2 and w > min_w_pts:
                y = (page_h_pts - max(ys)) * scale
                if page_h_px * 0.05 < y < page_h_px * 0.95:
                    raw_h.append({
                        "left": min(xs) * scale,
                        "right": max(xs) * scale, "y": y})
            elif w < 2 and h > 10:
                top = (page_h_pts - max(ys)) * scale
                bottom = (page_h_pts - min(ys)) * scale
                if bottom - top <= page_h_px * 0.8:
                    raw_v.append({"x": min(xs) * scale, "top": top,
                                  "bottom": bottom})
    h_lines = merge_collinear_segments(raw_h, "y", "left", "right")
    v_lines = merge_collinear_segments(raw_v, "x", "top", "bottom")
    return h_lines, v_lines, filled_rects, header_fills


def reconstitute_dashed_lines(paths, h_lines, v_lines, scale: float,
                              page_h_pts: float, page_h: float) -> None:
    """Rebuild full-length rules from dashed/dotted stroke pieces
    (reconstituteDashedLines, detectPdfTables.js:1784-1864): some PDFs
    draw dashed borders as dozens of individual 2-command stroked
    segments too short for the normal thresholds. Signature: >= 5
    collinear pieces (position within 2 pt) whose median gap is
    < 2 pt. Reconstituted lines are appended to h_lines / v_lines in
    display space; page-spanning verticals and page-margin horizontals
    are skipped as decoration."""
    v_cand, h_cand = [], []
    for path in paths:
        if not path.stroke:
            continue
        cmds = path.commands
        if len(cmds) != 2 or cmds[0][0] != "M" or cmds[1][0] != "L":
            continue
        w = abs(cmds[1][1] - cmds[0][1])
        h = abs(cmds[1][2] - cmds[0][2])
        if w < 2 and 1 < h <= 10:
            v_cand.append({"x": (cmds[0][1] + cmds[1][1]) / 2,
                           "y1": min(cmds[0][2], cmds[1][2]),
                           "y2": max(cmds[0][2], cmds[1][2])})
        elif h < 2 and 1 < w <= 30:
            h_cand.append({"y": (cmds[0][2] + cmds[1][2]) / 2,
                           "x1": min(cmds[0][1], cmds[1][1]),
                           "x2": max(cmds[0][1], cmds[1][1])})

    def groups_by(items, key):
        out: list[list[dict]] = []
        for it in sorted(items, key=lambda d: d[key]):
            if out and abs(it[key] - out[-1][-1][key]) <= 2:
                out[-1].append(it)
            else:
                out.append([it])
        return out

    if len(v_cand) >= 5:
        for g in groups_by(v_cand, "x"):
            if len(g) < 5:
                continue
            g.sort(key=lambda d: d["y1"])
            gaps = sorted(g[i]["y1"] - g[i - 1]["y2"]
                          for i in range(1, len(g)))
            med = gaps[len(gaps) // 2]
            if med < 0 or med >= 2:
                continue
            avg_x = sum(d["x"] for d in g) / len(g)
            top = (page_h_pts - g[-1]["y2"]) * scale
            bottom = (page_h_pts - g[0]["y1"]) * scale
            if bottom - top > page_h * 0.8:
                continue  # page border, not a table rule
            v_lines.append({"x": avg_x * scale, "top": top,
                            "bottom": bottom})
    if len(h_cand) >= 5:
        for g in groups_by(h_cand, "y"):
            if len(g) < 5:
                continue
            g.sort(key=lambda d: d["x1"])
            gaps = sorted(g[i]["x1"] - g[i - 1]["x2"]
                          for i in range(1, len(g)))
            med = gaps[len(gaps) // 2]
            if med < 0 or med >= 2:
                continue
            avg_y = sum(d["y"] for d in g) / len(g)
            y = (page_h_pts - avg_y) * scale
            if y < page_h * 0.05 or y > page_h * 0.95:
                continue  # margin decoration
            h_lines.append({"left": g[0]["x1"] * scale,
                            "right": g[-1]["x2"] * scale, "y": y})


def _cluster(values, tol: float) -> list[float]:
    out: list[list[float]] = []
    for v in sorted(values):
        if out and v - out[-1][-1] <= tol:
            out[-1].append(v)
        else:
            out.append([v])
    return [sum(c) / len(c) for c in out]


def extract_grid_segments(paths, scale: float, page_h_pts: float):
    """Grid-specific segment extraction (extractGridSegments,
    detectPdfTables.js:2079-2155) — more inclusive than
    classify_rule_lines: every edge of every stroked rectangle is
    decomposed (per-cell ``re S`` borders become shared grid lines,
    no tiling check), stroked polylines emit each M-L piece, and thin
    filled rectangles become single segments. Returns raw (h, v)
    segment lists for merge_collinear_segments."""
    h_lines: list[dict] = []
    v_lines: list[dict] = []

    def add_seg(x1, y1, x2, y2):
        w, h = abs(x2 - x1), abs(y2 - y1)
        if h < 2 and w > 5:
            h_lines.append({
                "left": min(x1, x2) * scale,
                "right": max(x1, x2) * scale,
                "y": (page_h_pts - (y1 + y2) / 2) * scale})
        elif w < 2 and h > 5:
            v_lines.append({
                "x": (x1 + x2) / 2 * scale,
                "top": (page_h_pts - max(y1, y2)) * scale,
                "bottom": (page_h_pts - min(y1, y2)) * scale})

    for path in paths:
        if not path.fill and not path.stroke:
            continue
        cmds = path.commands
        if path.stroke and len(cmds) == 5 and cmds[0][0] == "M" \
                and cmds[1][0] == "L" and cmds[2][0] == "L" \
                and cmds[3][0] == "L" and cmds[4][0] == "Z":
            pts = [(c[1], c[2]) for c in cmds[:4]]
            for k in range(4):
                x1, y1 = pts[k]
                x2, y2 = pts[(k + 1) % 4]
                add_seg(x1, y1, x2, y2)
            continue
        if path.stroke:
            for k in range(len(cmds) - 1):
                if cmds[k][0] in ("M", "L") and cmds[k + 1][0] == "L":
                    add_seg(cmds[k][1], cmds[k][2],
                            cmds[k + 1][1], cmds[k + 1][2])
            continue
        xs = [c[1] for c in cmds if c[0] in ("M", "L")]
        ys = [c[2] for c in cmds if c[0] in ("M", "L")]
        if not xs:
            continue
        w, h = max(xs) - min(xs), max(ys) - min(ys)
        if h < 5 and w > 5:
            add_seg(min(xs), (min(ys) + max(ys)) / 2,
                    max(xs), (min(ys) + max(ys)) / 2)
        elif w < 5 and h > 5:
            add_seg((min(xs) + max(xs)) / 2, min(ys),
                    (min(xs) + max(xs)) / 2, max(ys))
    return h_lines, v_lines


def _union_spans_fully(segs, left: float, right: float,
                       tol: float) -> bool:
    """A chain of h-segments covers [left, right] with gaps <= tol
    (unionSpansFully, detectPdfTables.js:2276-2296)."""
    if not segs:
        return False
    cover = left
    for s in segs:
        if s["left"] > cover + tol:
            return False
        cover = max(cover, s["right"])
    return cover >= right - tol


def _try_strict_grid(h_lines, v_lines, page) -> dict | None:
    """One connected component of rules -> a grid table or None
    (tryDetectStrictGrid, detectPdfTables.js:2298-2395): every strip
    between consecutive rule ys must be horizontally closed and carry
    verticals aligned with the component's outer borders; data strips
    share one canonical column set, and the only allowed asymmetry is
    a header strip whose boundaries are a strict SUBSET of it (a
    header cell may span several data columns). Rows are populated
    per strip from the page lines."""
    if len(h_lines) < 3:
        return None
    left = min(h["left"] for h in h_lines)
    right = max(h["right"] for h in h_lines)
    if right - left < page.dims["width"] * 0.3:
        return None
    ys = _cluster([h["y"] for h in h_lines], 5)
    if len(ys) < 3:
        return None
    segs_by_y = {
        py: sorted(
            ({"left": h["left"], "right": h["right"]}
             for h in h_lines if abs(h["y"] - py) < 5),
            key=lambda s: s["left"])
        for py in ys}
    strips = []
    for i in range(len(ys) - 1):
        top, bot = ys[i], ys[i + 1]
        strip_vs = [v for v in v_lines
                    if v["top"] <= top + 10 and v["bottom"] >= bot - 10]
        xs = _cluster([v["x"] for v in strip_vs], 10)
        if len(xs) < 2 or abs(xs[0] - left) > 15 \
                or abs(xs[-1] - right) > 15:
            return None
        if not _union_spans_fully(segs_by_y[top], left, right, 15):
            return None
        if not _union_spans_fully(segs_by_y[bot], left, right, 15):
            return None
        strips.append({"top": top, "bottom": bot, "xs": xs})
    if len(strips) < 2:
        return None
    max_cols = max(len(s["xs"]) for s in strips)
    data = [s for s in strips if len(s["xs"]) == max_cols]
    if len(data) < 2:
        return None
    canon = data[0]["xs"]
    for s in data:
        if len(s["xs"]) != len(canon) or any(
                abs(a - b) >= 10 for a, b in zip(s["xs"], canon)):
            return None
    for s in strips:
        if len(s["xs"]) == max_cols:
            continue
        if any(not any(abs(cx - x) < 10 for cx in canon)
               for x in s["xs"]):
            return None
    bbox = Bbox(left, ys[0] - 5, right, ys[-1] + 5)
    rows = []
    for s in strips:
        idxs = [
            i for i, ln in enumerate(page.lines)
            if s["top"] - 5 <= (ln.bbox.top + ln.bbox.bottom) / 2
            <= s["bottom"] + 5
            and ln.bbox.left >= bbox.left - 10
            and ln.bbox.right <= bbox.right + 10]
        if idxs:
            rows.append({
                "line_indices": idxs,
                "y": sum(page.lines[i].bbox.top
                         for i in idxs) / len(idxs)})
    if len(rows) < 2:
        return None
    return {
        "bbox": bbox,
        "col_separators": canon[1:-1],
        "method": "grid",
        "rows": rows,
    }

def detect_strict_grids(h_lines, v_lines, page) -> list[dict]:
    """Full ruled grids, one per connected rule component
    (detectStrictGrids, detectPdfTables.js:2169-2243): segments joined
    through the grid's own intersections/abutments (tolerance 6) form
    a component; each component is tried independently, so two stacked
    or side-by-side grids on one page detect as two tables."""
    if len(h_lines) < 3 or len(v_lines) < 2:
        return []
    tol = 6.0
    n = len(h_lines) + len(v_lines)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for i, a in enumerate(h_lines):
        for j in range(i + 1, len(h_lines)):
            b = h_lines[j]
            if abs(a["y"] - b["y"]) <= tol and \
                    min(a["right"], b["right"]) >= \
                    max(a["left"], b["left"]) - tol:
                union(i, j)
        for j, v in enumerate(v_lines):
            if a["left"] - tol <= v["x"] <= a["right"] + tol \
                    and v["top"] - tol <= a["y"] <= v["bottom"] + tol:
                union(i, len(h_lines) + j)
    for i, a in enumerate(v_lines):
        for j in range(i + 1, len(v_lines)):
            b = v_lines[j]
            if abs(a["x"] - b["x"]) <= tol and \
                    min(a["bottom"], b["bottom"]) >= \
                    max(a["top"], b["top"]) - tol:
                union(len(h_lines) + i, len(h_lines) + j)

    comps: dict[int, tuple[list, list]] = {}
    for i, h in enumerate(h_lines):
        comps.setdefault(find(i), ([], []))[0].append(h)
    for j, v in enumerate(v_lines):
        comps.setdefault(find(len(h_lines) + j), ([], []))[1].append(v)

    out = []
    for hs, vs in comps.values():
        t = _try_strict_grid(hs, vs, page)
        if t is not None:
            out.append(t)
    out.sort(key=lambda t: (t["bbox"].top, t["bbox"].left))
    return out


def _cluster_hlines_by_x_extent(h_lines) -> list[list[dict]]:
    """Cluster h-lines by >50% x-overlap with the cluster's union
    extent, or abutment within 15 px (clusterHLinesByXExtent,
    detectPdfTables.js:4139-4174)."""
    clusters: list[dict] = []
    for hl in h_lines:
        for c in clusters:
            o_left = max(hl["left"], c["left"])
            o_right = min(hl["right"], c["right"])
            overlap = max(0.0, o_right - o_left)
            min_w = min(hl["right"] - hl["left"], c["right"] - c["left"])
            gap = o_left - o_right
            if (min_w > 0 and overlap / min_w > 0.5) \
                    or (0 <= gap < 15):
                c["lines"].append(hl)
                c["left"] = min(c["left"], hl["left"])
                c["right"] = max(c["right"], hl["right"])
                break
        else:
            clusters.append({"lines": [hl], "left": hl["left"],
                             "right": hl["right"]})
    return [c["lines"] for c in clusters]


def _split_cluster_by_y_gap(cluster: list[dict]) -> list[list[dict]]:
    """Recursively split an h-line cluster at y-gaps > 4-5x the median
    row gap — stacked tables sharing an x-extent separate here
    (splitClusterByYGap, detectPdfTables.js:4099-4134)."""
    srt = sorted(cluster, key=lambda h: h["y"])
    uniq = [(srt[i]["y"], i) for i in range(len(srt))
            if i == 0 or srt[i]["y"] - srt[i - 1]["y"] > 2]
    if len(uniq) < 2:
        return [cluster]
    gaps = [(uniq[i][0] - uniq[i - 1][0], uniq[i][1])
            for i in range(1, len(uniq))]
    by_gap = sorted(gaps)
    med = by_gap[(len(by_gap) - 1) // 2][0]
    max_gap, max_idx = max(gaps)
    ratio = 4 if len(uniq) >= 10 else 5
    if med <= 0 or max_gap <= med * ratio:
        return [cluster]
    return (_split_cluster_by_y_gap(srt[:max_idx])
            + _split_cluster_by_y_gap(srt[max_idx:]))


def _region_rows(page, bbox: Bbox) -> list[dict]:
    """Lines inside ``bbox`` grouped into visual rows, each row keeping
    its page line indices (collectRowsInBbox semantics)."""
    idxs = [i for i, ln in enumerate(page.lines)
            if ln.bbox.top >= bbox.top - 5
            and ln.bbox.bottom <= bbox.bottom + 5
            and ln.bbox.left >= bbox.left - 10
            and ln.bbox.right <= bbox.right + 10]
    rows: list[dict] = []
    for i in sorted(idxs, key=lambda i: page.lines[i].bbox.top):
        top = page.lines[i].bbox.top
        if rows and abs(top - rows[-1]["y"]) < 5:
            rows[-1]["line_indices"].append(i)
        else:
            rows.append({"y": top, "line_indices": [i]})
    return rows


def detect_segmented_hline_grids(page, h_lines, v_lines,
                                 header_fills) -> list[dict]:
    """Tables drawn as per-cell border segments — each row's bottom rule
    is several pieces breaking at column boundaries
    (detectSegmentedHLineGrids + detectSegmentedHLineTables,
    detectPdfTables.js:2411-2441, 3647-3770). Column separators come
    from the shared break pattern; >= 3 rows with a consistent pattern
    and < 3 region verticals (else it's a real grid) qualify. A cluster
    spanning several stacked tables splits at large y-gaps, and
    distinct break patterns within one cluster become separate tables
    — the spanning-cell / multi-table path."""
    if len(h_lines) < 3:
        return []
    out = []
    for cluster in _cluster_hlines_by_x_extent(h_lines):
        if len(cluster) < 3:
            continue
        for sub in _split_cluster_by_y_gap(cluster):
            if len(sub) < 3:
                continue
            c_left = min(h["left"] for h in sub)
            c_right = max(h["right"] for h in sub)
            c_top = min(h["y"] for h in sub)
            c_bottom = max(h["y"] for h in sub)
            region_v = [
                v for v in v_lines
                if c_left - 5 <= v["x"] <= c_right + 5
                and v["top"] <= c_bottom + 5
                and v["bottom"] >= c_top - 5]
            if len(region_v) >= 3:
                continue
            out.extend(_segmented_tables(sub, header_fills, page))
    return out


def _segmented_tables(cluster, header_fills, page) -> list[dict]:
    """Break-pattern grouping + table assembly for one y-split cluster
    (detectSegmentedHLineTables, detectPdfTables.js:3647-3770)."""
    row_breaks = []
    for hl in cluster:
        segs = hl.get("segments") or []
        if len(segs) < 2:
            continue
        segs = sorted(segs, key=lambda s: s["left"])
        row_breaks.append({
            "y": hl["y"],
            "breaks": [round(s["right"]) for s in segs[:-1]],
            "left": segs[0]["left"], "right": segs[-1]["right"]})
    if len(row_breaks) < 3:
        return []
    groups: list[list[dict]] = []
    for rb in row_breaks:
        for g in groups:
            ref = g[0]["breaks"]
            if len(ref) == len(rb["breaks"]) and all(
                    abs(a - b) <= 5
                    for a, b in zip(ref, rb["breaks"])):
                g.append(rb)
                break
        else:
            groups.append([rb])
    results = []
    for g in groups:
        if len(g) < 3 or len(g[0]["breaks"]) < 2:
            continue
        seps = sorted(
            sum(rb["breaks"][j] for rb in g) / len(g)
            for j in range(len(g[0]["breaks"])))
        left = min(rb["left"] for rb in g)
        right = max(rb["right"] for rb in g)
        top = min(rb["y"] for rb in g)
        bottom = max(rb["y"] for rb in g)
        if right - left < page.dims["width"] * 0.3:
            continue
        fill = next(
            (f for f in header_fills
             if abs(f["left"] - left) <= 15
             and abs(f["right"] - right) <= 15
             and top - 200 <= f["bottom"] <= top + 5), None)
        row_h = (bottom - top) / max(1, len(g) - 1)
        bbox = Bbox(
            left,
            max(0.0, fill["top"] - 5 if fill else top - row_h * 1.5),
            right, bottom + 5)
        rows = _region_rows(page, bbox)
        if len(rows) < 2:
            continue
        if sum(1 for r in rows if len(r["line_indices"]) >= 2) < 2:
            continue
        results.append({
            "bbox": bbox, "col_separators": seps,
            "method": "segmented-hline", "rows": rows,
        })
    return results


# ------------------------------------- Phase 1/2: text-side candidates


def find_table_like_rows(page) -> list[dict]:
    """Phase 1 (detectPdfTables.js:121-247): group lines into visual
    rows and keep the table-like ones —

    - multi-line rows whose stream indices are consecutive (gap <= 2)
      with numeric content OR >= 3 segments;
    - single-line right-clustered-numeric rows (financial statements
      emit label + leader + numbers as one line object);
    - column-major numeric rows: >= 4 index-scattered fragments of
      which >= 3 are pure-numeric singletons;
    - on multi-column pages, index-gapped rows split into consecutive
      sub-sequences tested independently.

    Returns [{y, line_indices, has_numbers}]."""
    lines = page.lines
    out = []
    for row in _region_rows(page, Bbox(float("-inf"), float("-inf"),
                                       float("inf"), float("inf"))):
        idxs = sorted(row["line_indices"])
        if len(idxs) < 2:
            if len(idxs) == 1 and is_right_clustered_numeric(
                    lines[idxs[0]].words):
                out.append({"y": row["y"], "line_indices": idxs,
                            "has_numbers": True})
            continue
        max_gap = max(idxs[k] - idxs[k - 1]
                      for k in range(1, len(idxs)))
        if max_gap > 2:
            subs, cur = [], [idxs[0]]
            for j in idxs[1:]:
                if j - cur[-1] <= 2:
                    cur.append(j)
                else:
                    subs.append(cur)
                    cur = [j]
            subs.append(cur)
            if len(subs) >= 4:
                pure = sum(
                    1 for s in subs
                    if len(s) == 1 and len(lines[s[0]].words) == 1
                    and is_num_word(lines[s[0]].words[0].text))
                if pure >= 3:
                    out.append({"y": row["y"], "line_indices": idxs,
                                "has_numbers": True})
                    continue
            for s in subs:
                if len(s) < 2:
                    if len(s) == 1 and is_right_clustered_numeric(
                            lines[s[0]].words):
                        out.append({"y": lines[s[0]].bbox.top,
                                    "line_indices": s,
                                    "has_numbers": True})
                    continue
                n_num = sum(
                    1 for i in s for w in lines[i].words
                    if is_num_word(w.text))
                if n_num >= 1 or len(s) >= 3:
                    out.append({
                        "y": sum(lines[i].bbox.top for i in s) / len(s),
                        "line_indices": s,
                        "has_numbers": n_num >= 1})
            continue
        n_num = sum(1 for i in idxs for w in lines[i].words
                    if is_num_word(w.text))
        if n_num >= 1 or len(idxs) >= 3:
            out.append({"y": row["y"], "line_indices": idxs,
                        "has_numbers": n_num >= 1})
    return out


def _bridge_ok(lines, bracket, y_low, y_high, left, right,
               x_tol, threshold) -> bool:
    """Section-header bridging (:955-1000 / :1063-1095): 1-3 narrow
    intervening lines inside the table's x-region whose y-steps all
    stay under the run threshold keep two table-like rows in one run;
    a wide (>60% of run width) line blocks the bridge."""
    ys = [y_low]
    any_wide = False
    for li, ln in enumerate(lines):
        if li in bracket:
            continue
        ly = ln.bbox.top
        if y_low < ly < y_high and left - x_tol <= ln.bbox.left <= right:
            ys.append(ly)
            if ln.bbox.right - ln.bbox.left > (right - left) * 0.6:
                any_wide = True
    if not (0 < len(ys) - 1 <= 3) or any_wide:
        return False
    ys.append(y_high)
    ys.sort()
    return max(ys[s] - ys[s - 1] for s in range(1, len(ys))) < threshold


def group_rows_into_candidates(table_like_rows: list[dict],
                               page) -> list[dict]:
    """Phase 2 (groupRowsIntoCandidates, detectPdfTables.js:908-1125):
    runs of vertically-close table-like rows (dynamic threshold =
    max(3x median spacing, 150) capped at 20% page height, with
    section-header bridging), split into x-overlap clusters via
    union-find (side-by-side tables on multi-column pages), each
    cluster's y-gaps re-checked with cluster-local width, surviving
    sub-clusters of >= 3 rows (4 when no row has numbers) become
    candidates. bbox.top is expanded by 3 average row heights for
    path correlation (:1107-1110); Phase 5.5 refine_table_top
    re-shrinks it once header evidence is in."""
    lines = page.lines
    rows = sorted(table_like_rows, key=lambda r: r["y"])
    if not rows:
        return []
    threshold = 150.0
    if len(rows) >= 3:
        spac = sorted(rows[i]["y"] - rows[i - 1]["y"]
                      for i in range(1, len(rows)))
        threshold = max(spac[len(spac) // 2] * 3, 150.0)
    threshold = min(threshold, page.dims["height"] * 0.2)

    def extent(row):
        ls = [lines[i].bbox.left for i in row["line_indices"]]
        rs = [lines[i].bbox.right for i in row["line_indices"]]
        return min(ls), max(rs)

    candidates = []
    run_start = 0
    for i in range(1, len(rows) + 1):
        cont = False
        if i < len(rows):
            gap = rows[i]["y"] - rows[i - 1]["y"]
            if gap < threshold:
                cont = True
            else:
                l0, r0 = extent(rows[i - 1])
                l1, r1 = extent(rows[i])
                left, right = min(l0, l1), max(r0, r1)
                bracket = set(rows[i - 1]["line_indices"]) \
                    | set(rows[i]["line_indices"])
                cont = _bridge_ok(
                    lines, bracket, rows[i - 1]["y"], rows[i]["y"],
                    left, right, max(50.0, (right - left) * 0.05),
                    threshold)
        if cont:
            continue
        run = rows[run_start:i]
        run_start = i
        min_rows = 3 if any(r["has_numbers"] for r in run) else 4
        if len(run) < min_rows:
            continue
        # x-overlap union-find clustering
        exts = [extent(r) for r in run]
        parent = list(range(len(run)))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for a in range(len(run)):
            for b in range(a + 1, len(run)):
                if exts[a][1] > exts[b][0] + 10 \
                        and exts[b][1] > exts[a][0] + 10:
                    parent[find(a)] = find(b)
        clusters: dict[int, list[dict]] = {}
        for j, r in enumerate(run):
            clusters.setdefault(find(j), []).append(r)
        for cluster in clusters.values():
            if len(cluster) < min_rows:
                continue
            cluster.sort(key=lambda r: r["y"])
            c_l = min(lines[i2].bbox.left for r in cluster
                      for i2 in r["line_indices"])
            c_r = max(lines[i2].bbox.right for r in cluster
                      for i2 in r["line_indices"])
            splits = [0]
            for k in range(1, len(cluster)):
                if cluster[k]["y"] - cluster[k - 1]["y"] <= threshold:
                    continue
                bracket = set(cluster[k - 1]["line_indices"]) \
                    | set(cluster[k]["line_indices"])
                if not _bridge_ok(
                        lines, bracket, cluster[k - 1]["y"],
                        cluster[k]["y"], c_l, c_r,
                        max(50.0, (c_r - c_l) * 0.05), threshold):
                    splits.append(k)
            splits.append(len(cluster))
            for si in range(len(splits) - 1):
                sub = cluster[splits[si]:splits[si + 1]]
                if len(sub) < min_rows:
                    continue
                idxs = [i2 for r in sub for i2 in r["line_indices"]]
                bbox = Bbox(
                    min(lines[i2].bbox.left for i2 in idxs),
                    min(lines[i2].bbox.top for i2 in idxs),
                    max(lines[i2].bbox.right for i2 in idxs),
                    max(lines[i2].bbox.bottom for i2 in idxs))
                # generous top expansion for path correlation; the
                # final top is refined in Phase 5.5 once hLine data is
                # available (refineTableTop)
                avg_rh = (bbox.bottom - bbox.top) / len(sub)
                bbox = Bbox(bbox.left, max(0.0, bbox.top - avg_rh * 3),
                            bbox.right, bbox.bottom)
                candidates.append({
                    "bbox": bbox,
                    "rows": [{"y": r["y"],
                              "line_indices": list(r["line_indices"])}
                             for r in sub],
                    "col_separators": [],
                    "method": "numeric" if any(
                        r["has_numbers"] for r in sub) else "text",
                })
    return candidates


_HAS_LETTER_RE = re.compile(r"[a-zA-Z]")


def validate_candidate(cand: dict, lines) -> bool:
    """Phase 4 (validateCandidate, detectPdfTables.js:1914-2063):

    1. >= 3 multi-segment rows (single-line right-clustered-numeric
       counts);
    2. >= 2 aligned edge positions (left and right edges binned to 5,
       each needing max(2, 0.3 x rows) occurrences — right-aligned
       numeric columns align on the right only);
    3. segment-count consistency (mode, +-1 cluster for >= 10 rows,
       >= 40%);
    4. tiny-fragment rejection (> 70% of lines narrower than 70 px =
       equation subscripts, not cells);
    5. prose-cell rejection (> 40% of rows have >= 2 cells with 3+
       alphabetic words and zero numeric tokens);
    6. narrative-row rejection (> 50% of multi-seg rows where every
       cell is a 2+-word text fragment and none is narrow)."""
    rows = cand["rows"]

    def multi_seg(r):
        return len(r["line_indices"]) >= 2 or (
            len(r["line_indices"]) == 1
            and is_right_clustered_numeric(
                lines[r["line_indices"][0]].words))

    ms_rows = [r for r in rows if multi_seg(r)]
    if len(ms_rows) < 3:
        return False

    left_counts: dict[int, int] = {}
    right_counts: dict[int, int] = {}
    for r in rows:
        for i in r["line_indices"]:
            lk = round(lines[i].bbox.left / 5) * 5
            rk = round(lines[i].bbox.right / 5) * 5
            left_counts[lk] = left_counts.get(lk, 0) + 1
            right_counts[rk] = right_counts.get(rk, 0) + 1
    need = max(2, len(rows) * 0.3)
    aligned = sum(1 for c in left_counts.values() if c >= need) \
        + sum(1 for c in right_counts.values() if c >= need)
    if aligned < 2:
        return False

    seg_counts: dict[int, int] = {}
    for r in ms_rows:
        n = len(r["line_indices"])
        seg_counts[n] = seg_counts.get(n, 0) + 1
    if len(ms_rows) >= 10:
        best = max(
            (seg_counts.get(c - 1, 0) + seg_counts.get(c, 0)
             + seg_counts.get(c + 1, 0)) for c in seg_counts)
        if best < len(ms_rows) * 0.4:
            return False
    elif max(seg_counts.values()) < len(ms_rows) * 0.4:
        return False

    total = tiny = 0
    for r in rows:
        for i in r["line_indices"]:
            total += 1
            if lines[i].bbox.right - lines[i].bbox.left < 70:
                tiny += 1
    if total and tiny / total > 0.7:
        return False

    def cell_is_prose(i):
        ws = lines[i].words
        if len(ws) < 3:
            return False
        alpha = sum(1 for w in ws if _HAS_LETTER_RE.search(w.text))
        numeric = sum(1 for w in ws if is_num_word(w.text))
        return alpha >= 3 and numeric == 0

    prose_rows = sum(
        1 for r in rows if len(r["line_indices"]) >= 2
        and sum(1 for i in r["line_indices"] if cell_is_prose(i)) >= 2)
    if prose_rows > len(rows) * 0.4:
        return False

    def cell_is_text_fragment(i):
        ws = lines[i].words
        return len(ws) >= 2 and any(
            _HAS_LETTER_RE.search(w.text) for w in ws)

    n_ms = sum(1 for r in rows if len(r["line_indices"]) >= 2)
    if n_ms >= 3:
        narrative = 0
        for r in rows:
            idxs = r["line_indices"]
            if len(idxs) < 2:
                continue
            max_w = max(lines[i].bbox.right - lines[i].bbox.left
                        for i in idxs)
            if all(cell_is_text_fragment(i)
                   and lines[i].bbox.right - lines[i].bbox.left
                   >= max_w * 0.5 for i in idxs):
                narrative += 1
        if narrative > n_ms * 0.5:
            return False
    return True


def extract_row_band_structure(filled_rects: list[dict]) -> list[dict]:
    """Phase 3.5 (extractRowBandStructure, detectPdfTables.js:1542-1704):
    filled rects -> row-band regions. Fills group by y-range (tol 2),
    each group's touching fills merge into disjoint x-ranges while the
    raw per-cell extents are kept; bands (width > 50) cluster into
    vertically-contiguous regions; cell edges appearing in at least
    half the bands become the dominant column anchors, and separators
    are the midpoints between adjacent dominant right/left pairs.

    Returns [{top, bottom, left, right, col_xs, row_ys}]."""
    if not filled_rects or len(filled_rects) < 3:
        return []
    y_groups: list[dict] = []
    for f in filled_rects:
        for g in y_groups:
            if abs(g["top"] - f["top"]) < 2 \
                    and abs(g["bottom"] - f["bottom"]) < 2:
                g["items"].append(f)
                break
        else:
            y_groups.append({"top": f["top"], "bottom": f["bottom"],
                             "items": [f]})
    bands = []
    for g in y_groups:
        items = sorted(g["items"], key=lambda f: f["left"])
        ranges: list[list[float]] = []
        cells = []
        for f in items:
            cells.append((f["left"], f["right"]))
            if ranges and f["left"] <= ranges[-1][1] + 0.5:
                ranges[-1][1] = max(ranges[-1][1], f["right"])
            else:
                ranges.append([f["left"], f["right"]])
        if not ranges or ranges[-1][1] - ranges[0][0] <= 50:
            continue
        bands.append({"top": g["top"], "bottom": g["bottom"],
                      "ranges": ranges, "cells": cells})
    if len(bands) < 3:
        return []
    bands.sort(key=lambda b: b["top"])
    regions: list[list[dict]] = []
    for b in bands:
        b_left = b["ranges"][0][0]
        b_right = b["ranges"][-1][1]
        for r in regions:
            last = r[-1]
            gap = b["top"] - last["bottom"]
            vert_close = gap <= max(
                (last["bottom"] - last["top"]) * 2, 10)
            h_overlap = b_right > last["ranges"][0][0] \
                and b_left < last["ranges"][-1][1]
            if vert_close and h_overlap:
                r.append(b)
                break
        else:
            regions.append([b])

    def _cluster_anchors(values: list[float]) -> list[dict]:
        out: list[dict] = []
        for v in sorted(values):
            if out and v - out[-1]["mean"] < 3:
                out[-1]["values"].append(v)
                out[-1]["mean"] = (sum(out[-1]["values"])
                                   / len(out[-1]["values"]))
            else:
                out.append({"values": [v], "mean": v})
        return out

    results = []
    for region in regions:
        if len(region) < 3:
            continue
        lefts = [c[0] for b in region for c in b["cells"]]
        rights = [c[1] for b in region for c in b["cells"]]
        min_count = -(-len(region) // 2)
        dom_l = sorted(c["mean"] for c in _cluster_anchors(lefts)
                       if len(c["values"]) >= min_count)
        dom_r = sorted(c["mean"] for c in _cluster_anchors(rights)
                       if len(c["values"]) >= min_count)
        if not dom_l:
            continue
        col_xs = [(dom_r[i] + dom_l[i + 1]) / 2
                  for i in range(len(dom_l) - 1)
                  if i < len(dom_r)]
        results.append({
            "top": region[0]["top"], "bottom": region[-1]["bottom"],
            "left": dom_l[0], "right": dom_r[-1] if dom_r else dom_l[0],
            "col_xs": col_xs,
            "row_ys": [(b["top"], b["bottom"]) for b in region],
        })
    return results


def make_row_band_candidates(rbr: dict, base: dict | None,
                             page) -> list[dict]:
    """Row-band region -> table candidate(s)
    (makeRowBandCandidates, detectPdfTables.js:802-878): rows inside
    the band bbox, split at y-gaps > 2x the median row spacing (and
    > 50) into one candidate per group. Column structure is NOT set
    here — each candidate carries the region (``row_band``) and the
    fills flow through extract_structure (:809-817)."""
    left = min(base["bbox"].left, rbr["left"]) if base else rbr["left"]
    right = max(base["bbox"].right, rbr["right"]) if base \
        else rbr["right"]
    bbox = Bbox(left, rbr["top"], right, rbr["bottom"])
    rows = _region_rows(page, bbox)

    def cand(bb, rws):
        return {"bbox": bb, "col_separators": [],
                "method": "row-band", "rows": rws, "row_band": rbr}

    if len(rows) < 3:
        return [cand(bbox, rows)]
    srt = sorted(rows, key=lambda r: r["y"])
    spacings = [srt[i]["y"] - srt[i - 1]["y"]
                for i in range(1, len(srt))]
    med = sorted(spacings)[len(spacings) // 2]
    groups = [[0, 0]]
    for i in range(1, len(srt)):
        if spacings[i - 1] > med * 2 and spacings[i - 1] > 50:
            groups.append([i, i])
        else:
            groups[-1][1] = i
    if len(groups) == 1:
        return [cand(bbox, rows)]
    out = []
    for s, e in groups:
        if e - s < 2:
            continue
        grows = srt[s:e + 1]
        bottom = max(page.lines[li].bbox.bottom
                     for r in grows for li in r["line_indices"])
        sub = Bbox(left,
                   bbox.top if s == 0 else grows[0]["y"],
                   right,
                   bbox.bottom if e == len(srt) - 1 else bottom + 5)
        out.append(cand(sub, _region_rows(page, sub)))
    return out


def extend_table_to_adjacent_content(table: dict, page,
                                     siblings: list[dict]) -> None:
    """Phase 5.6 (extendTableToAdjacentContent,
    detectPdfTables.js:3827-4010): widen a table to content the rule
    grid missed —

    - LEFT: narrow lines clearly left of the bbox whose tops align
      with existing rows on more than half the rows form an unstroked
      label column (the old bbox.left becomes a separator); pure
      page-furniture number strips (no alphabetic text) are refused,
      as is a candidate strip as wide as half the table (a parallel
      table in the other page column);
    - TOP (only after a left extension): a heading line inside the new
      label column within 2 median row heights above the top;
    - BOTTOM: rows just below whose >= 2 segments land inside the
      existing column structure are continuation rows (Total /
      Previous Year); stops at the first non-aligning row and clamps
      at a stacked sibling's first data row."""
    rows = table.get("rows")
    if not rows or len(rows) < 2:
        return
    lines = page.lines
    srt = sorted(r["y"] for r in rows)
    spac = sorted(srt[i] - srt[i - 1] for i in range(1, len(srt)))
    median = spac[len(spac) // 2] if spac else 50.0
    y_match = max(10.0, median * 0.4)
    existing = {i for r in rows for i in r["line_indices"]}
    bbox = table["bbox"]
    bw = bbox.right - bbox.left

    left_adj: dict[float, list[int]] = {}
    overlap_adj: dict[float, list[int]] = {}
    for i, ln in enumerate(lines):
        if i in existing or ln.bbox.left >= bbox.left - 10:
            continue
        row_y = next((r["y"] for r in rows
                      if abs(ln.bbox.top - r["y"]) <= y_match), None)
        if row_y is None:
            continue
        clearly_left = ln.bbox.right < bbox.left - 10
        if clearly_left and ln.bbox.right - ln.bbox.left < bw * 0.5:
            left_adj.setdefault(row_y, []).append(i)
        elif not clearly_left:
            overlap_adj.setdefault(row_y, []).append(i)

    extended_left = False
    old_left = bbox.left
    if len(left_adj) > len(rows) * 0.5 and len(left_adj) >= 2:
        adj_idxs = [i for arr in left_adj.values() for i in arr]
        new_left = min(lines[i].bbox.left for i in adj_idxs)
        max_right = max(lines[i].bbox.right for i in adj_idxs)
        if not any(_ALPHA_RE.search(w.text)
                   for i in adj_idxs for w in lines[i].words):
            return  # page-furniture number strip, not a label column
        if max_right - new_left >= bw * 0.5:
            return  # parallel table body, not a narrow label strip
        if new_left < old_left - 10:
            table["col_separators"] = sorted(
                [old_left] + list(table["col_separators"]))
            table["bbox"] = bbox = Bbox(
                new_left, bbox.top, bbox.right, bbox.bottom)
            for row_y, arr in list(left_adj.items()) \
                    + list(overlap_adj.items()):
                r = next((r for r in rows if r["y"] == row_y), None)
                if r:
                    r["line_indices"].extend(
                        i for i in arr if i not in r["line_indices"])
            extended_left = True

    if extended_left:
        label_right = table["col_separators"][0]
        top_limit = bbox.top - median * 2
        new_top = bbox.top
        for i, ln in enumerate(lines):
            if i in existing:
                continue
            if top_limit <= ln.bbox.top < new_top \
                    and ln.bbox.left >= bbox.left - 5 \
                    and ln.bbox.right <= label_right + 5:
                new_top = ln.bbox.top
        if new_top < bbox.top:
            table["bbox"] = bbox = Bbox(
                bbox.left, new_top, bbox.right, bbox.bottom)

    bounds = [bbox.left] + list(table["col_separators"]) + [bbox.right]
    below_limit = bbox.bottom + median * 1.5
    for other in siblings:
        if other is table or not other.get("rows"):
            continue
        if other["bbox"].right < bbox.left \
                or other["bbox"].left > bbox.right:
            continue
        first_y = min(r["y"] for r in other["rows"])
        if bbox.bottom < first_y and first_y - 5 < below_limit:
            below_limit = first_y - 5
    below: dict[float, list[int]] = {}
    for i, ln in enumerate(lines):
        if i in existing:
            continue
        ly = ln.bbox.top
        if not bbox.bottom < ly <= below_limit:
            continue
        if ln.bbox.right < bbox.left or ln.bbox.left > bbox.right:
            continue
        key = next((y for y in below if abs(ly - y) < 5), None)
        below.setdefault(key if key is not None else ly, []).append(i)
    for y in sorted(below):
        arr = below[y]
        if len(arr) < 2:
            continue
        col_hits = sum(
            1 for i in arr
            if any(lines[i].bbox.right > bounds[c]
                   and lines[i].bbox.left < bounds[c + 1]
                   for c in range(len(bounds) - 1)))
        if col_hits < 2:
            break
        bottom = max(max(lines[i].bbox.bottom for i in arr),
                     bbox.bottom)
        table["bbox"] = bbox = Bbox(
            bbox.left, bbox.top, bbox.right, bottom)
        rows.append({"y": y, "line_indices": arr})


_TABLE_TITLE_RE = re.compile(r"^Table\s+\d+", re.I)


def detect_table_title(table: dict, lines) -> dict | None:
    """'Table N ...' caption: nearest such line within 50 px above the
    table, else a title-shaped first line inside it (detectTableTitle,
    detectPdfTables.js:3775-3817)."""
    bbox = table["bbox"]
    best = None
    for ln in lines:
        if ln.bbox.bottom > bbox.top or \
                ln.bbox.bottom < bbox.top - 50 or \
                ln.bbox.right < bbox.left or ln.bbox.left > bbox.right:
            continue
        text = " ".join(w.text for w in ln.words)
        if not _TABLE_TITLE_RE.match(text):
            continue
        dist = bbox.top - ln.bbox.bottom
        if best is None or dist < best[0]:
            best = (dist, text)
    if best:
        return {"text": best[1]}
    inside = [ln for ln in lines
              if bbox.top <= ln.bbox.top <= bbox.bottom
              and ln.bbox.right >= bbox.left
              and ln.bbox.left <= bbox.right]
    if inside:
        first = min(inside, key=lambda ln: ln.bbox.top)
        text = " ".join(w.text for w in first.words)
        if _TABLE_TITLE_RE.match(text):
            return {"text": text}
    return None


def validate_stream_order(table: dict, lines) -> bool:
    """Phase 6 (validateStreamOrder, detectPdfTables.js:4018-4051):
    drop rows whose spatial left-to-right order contradicts content
    stream order (chart labels swept into a candidate); column-major
    rows (index gaps > 2) skip the check. The table survives with
    >= 3 remaining rows. Mutates ``table['rows']``."""
    rows = table.get("rows")
    if rows is None:
        return True
    keep = []
    for row in rows:
        idxs = row["line_indices"]
        if len(idxs) >= 2:
            max_gap = max(idxs[k] - idxs[k - 1]
                          for k in range(1, len(idxs)))
            if max_gap <= 2:
                by_x = sorted(idxs,
                              key=lambda i: lines[i].bbox.left)
                if any(by_x[j] < by_x[j - 1]
                       for j in range(1, len(by_x))):
                    continue
        keep.append(row)
    table["rows"] = keep
    return len(keep) >= 3


def detect_header_rule_tables(h_lines, page) -> list[dict]:
    """Tables anchored to a "ruling row" — a y-band of >= 3 mutually
    disjoint horizontal rule segments spanning >= 30% of the page
    (column underlines beneath a header row). Ports
    detectHeaderRuleTables (detectPdfTables.js:3354-3594): y-grouping
    (tol 3), subtotal-rule subset dedup, upward header scan
    (1.5x median header spacing), downward data scan (2.5x median
    early spacing, bounded by the next primary), column separators at
    rule-segment midpoints, and the numeric-distribution validation
    (>= 5 rows hitting 2+ numeric columns, >= 1 non-label column
    numeric in >= 50% of rows)."""
    lines = page.lines
    if not lines or not h_lines:
        return []
    page_w = page.dims["width"]

    y_groups: list[dict] = []
    for hl in h_lines:
        for g in y_groups:
            if abs(g["y"] - hl["y"]) <= 3:
                g["lines"].append(hl)
                g["y"] = sum(x["y"] for x in g["lines"]) / len(g["lines"])
                break
        else:
            y_groups.append({"y": hl["y"], "lines": [hl]})

    ruling_rows = []
    for g in y_groups:
        if len(g["lines"]) < 3:
            continue
        cols = sorted(g["lines"], key=lambda x: x["left"])
        if any(cols[i]["left"] < cols[i - 1]["right"] - 1
               for i in range(1, len(cols))):
            continue
        if cols[-1]["right"] - cols[0]["left"] < page_w * 0.3:
            continue
        ruling_rows.append({"y": g["y"], "cols": cols})
    if not ruling_rows:
        return []
    ruling_rows.sort(key=lambda r: r["y"])

    def is_subset(sub, primary, tol=5):
        return all(any(abs(c["left"] - pc["left"]) < tol
                       and abs(c["right"] - pc["right"]) < tol
                       for pc in primary["cols"]) for c in sub["cols"])

    primaries = []
    for rr in ruling_rows:
        if not any(is_subset(rr, p["rule"]) for p in primaries):
            left = rr["cols"][0]["left"]
            right = rr["cols"][-1]["right"]
            primaries.append({
                "rule": rr, "left": left, "right": right,
                "slack": max(20.0, (right - left) * 0.02),
                "header_top": rr["y"], "header_idx": []})

    # upward header scan
    for pii, p in enumerate(primaries):
        upper = primaries[pii - 1]["rule"]["y"] + 5 if pii > 0 else 0
        above = sorted(
            ((i, ln) for i, ln in enumerate(lines)
             if ln.bbox.bottom <= p["rule"]["y"]
             and ln.bbox.bottom >= upper
             and ln.bbox.left >= p["left"] - p["slack"]
             and ln.bbox.right <= p["right"] + p["slack"]),
            key=lambda t: -t[1].bbox.top)
        tops = sorted((ln.bbox.top for _i, ln in above[:8]), reverse=True)
        spacings = sorted(tops[i - 1] - tops[i]
                          for i in range(1, len(tops)))
        med = spacings[len(spacings) // 2] if spacings else 30
        gap_limit = max(med * 1.5, 45)
        prev_top = p["rule"]["y"]
        for i, ln in above:
            if prev_top - ln.bbox.top > gap_limit:
                break
            p["header_idx"].append(i)
            p["header_top"] = ln.bbox.top
            prev_top = ln.bbox.top

    results = []
    for pii, p in enumerate(primaries):
        lower = (primaries[pii + 1]["header_top"] - 1
                 if pii + 1 < len(primaries) else page.dims["height"])
        below = sorted(
            ((i, ln) for i, ln in enumerate(lines)
             if p["rule"]["y"] <= ln.bbox.top <= lower
             and ln.bbox.left >= p["left"] - p["slack"]
             and ln.bbox.right <= p["right"] + p["slack"]),
            key=lambda t: t[1].bbox.top)
        if len(below) < 2:
            continue
        early = sorted(below[i][1].bbox.top - below[i - 1][1].bbox.top
                       for i in range(1, min(len(below), 6)))
        med = early[len(early) // 2] if early else 30
        data_gap = max(med * 2.5, 80)
        data_idx = []
        prev_top = p["rule"]["y"]
        for i, ln in below:
            if data_idx and ln.bbox.top - prev_top > data_gap:
                break
            data_idx.append(i)
            prev_top = ln.bbox.top
        if len(data_idx) < 2:
            continue
        data_idx += p["header_idx"]

        cols = p["rule"]["cols"]
        seps = [(cols[i - 1]["right"] + cols[i]["left"]) / 2
                for i in range(1, len(cols))]
        bottom = max(lines[i].bbox.bottom for i in data_idx)
        rows = group_lines_into_rows([lines[i] for i in data_idx])
        if len(rows) < 3:
            continue

        # numeric-distribution validation
        bounds = [p["left"]] + seps + [p["right"]]
        col_numeric = [0] * (len(bounds) - 1)
        multi_col_rows = 0
        for row in rows:
            hit = set()
            for ln in row:
                for w in ln.words:
                    # reference gate: must contain a digit (:3558-3559)
                    if not (_DIGIT_RE.search(w.text)
                            and _NUM_TOKEN_RE.match(w.text)):
                        continue
                    cx = (w.bbox.left + w.bbox.right) / 2
                    for ci in range(len(bounds) - 1):
                        if bounds[ci] <= cx < bounds[ci + 1]:
                            hit.add(ci)
                            break
            if len(hit) >= 2:
                multi_col_rows += 1
            for ci in hit:
                col_numeric[ci] += 1
        if multi_col_rows < 5:
            continue
        if not any(col_numeric[ci] >= len(rows) * 0.5
                   for ci in range(1, len(col_numeric))):
            continue

        results.append({
            "bbox": Bbox(p["left"], p["header_top"], p["right"], bottom),
            "col_separators": seps,
            "method": "header-rule",
        })
    return results


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


_YEAR_RE = re.compile(r"^(?:19|20)\d\d$")
_FOOTMARK_RE = re.compile(r"^\(\d\)$")
_ALPHA_RE = re.compile(r"[a-zA-Z]")


def _is_data_value_word(t: str) -> bool:
    return (is_num_word(t) and not _YEAR_RE.match(t)
            and not _FOOTMARK_RE.match(t))


def _phrase_merge(words, gap_factor: float = 0.6) -> list[list]:
    """Merge consecutive words whose inter-word gap is small relative
    to the average word height into one cell box (extractStructure /
    extractCells gap rule, detectPdfTables.js:2525-2549). Returns
    [(left, right, words)] sorted by left."""
    ws = sorted(words, key=lambda w: w.bbox.left)
    if not ws:
        return []
    avg_h = sum(w.bbox.bottom - w.bbox.top for w in ws) / len(ws)
    gap = avg_h * gap_factor
    cells = [[ws[0].bbox.left, ws[0].bbox.right, [ws[0]]]]
    for w in ws[1:]:
        if w.bbox.left - cells[-1][1] < gap:
            cells[-1][1] = max(cells[-1][1], w.bbox.right)
            cells[-1][2].append(w)
        else:
            cells.append([w.bbox.left, w.bbox.right, [w]])
    return cells


_CURRENCY_RE = re.compile(r"^[$\u20ac\u00a3\u00a5\u00a2]+$")
_LEADER_RE = re.compile(r"^[*.]+$")


def _merge_row_cells(row_words, avg_line_h: float) -> list[dict]:
    """extractStructure's row-level cell merger
    (detectPdfTables.js:2890-2947), in spatial order: a currency
    symbol (or a run of coincident duplicates) chains into the
    following word; leader-filler dot runs absorb into the current
    phrase regardless of gap; digit-bearing words NEVER merge into a
    phrase (independent numeric cells); otherwise consecutive textual
    words merge while the x-gap stays under 0.4x the line height."""
    ws = sorted(row_words, key=lambda w: w.bbox.left)
    gap_threshold = avg_line_h * 0.4
    cells = []
    w = 0
    while w < len(ws):
        if _CURRENCY_RE.match(ws[w].text):
            left, right = ws[w].bbox.left, ws[w].bbox.right
            top = ws[w].bbox.top
            j2 = w + 1
            while j2 < len(ws) and _CURRENCY_RE.match(ws[j2].text):
                left = min(left, ws[j2].bbox.left)
                right = max(right, ws[j2].bbox.right)
                top = min(top, ws[j2].bbox.top)
                j2 += 1
            if j2 < len(ws):
                left = min(left, ws[j2].bbox.left)
                right = max(right, ws[j2].bbox.right)
                top = min(top, ws[j2].bbox.top)
                j2 += 1
            cells.append({"left": left, "right": right, "top": top})
            w = j2
            continue
        left, right = ws[w].bbox.left, ws[w].bbox.right
        top = ws[w].bbox.top
        cur_has_digit = bool(_DIGIT_RE.search(ws[w].text))
        j2 = w + 1
        while j2 < len(ws) and not _CURRENCY_RE.match(ws[j2].text):
            t = ws[j2].text
            if len(t) >= 3 and _LEADER_RE.match(t):
                left = min(left, ws[j2].bbox.left)
                right = max(right, ws[j2].bbox.right)
                top = min(top, ws[j2].bbox.top)
                j2 += 1
                continue
            if cur_has_digit or _DIGIT_RE.search(t):
                break
            if ws[j2].bbox.left - right > gap_threshold:
                break
            left = min(left, ws[j2].bbox.left)
            right = max(right, ws[j2].bbox.right)
            top = min(top, ws[j2].bbox.top)
            j2 += 1
        cells.append({"left": left, "right": right, "top": top})
        w = j2
    return cells


def _is_narrative_line(line) -> bool:
    """Footnote/prose line inside a candidate
    (extractStructure :2800-2812): 7+ non-leader words of which fewer
    than half are numeric/currency."""
    total = numeric = 0
    for w in line.words:
        if _LEADER_RE.match(w.text):
            continue
        total += 1
        if is_num_word(w.text) or _CURRENCY_RE.match(w.text):
            numeric += 1
    return total > 6 and numeric / total < 0.5


def _line_is_pure_text(line) -> bool:
    for w in line.words:
        if is_num_word(w.text) or _CURRENCY_RE.match(w.text):
            return False
    return True


def infer_unruled_columns(page, table: dict) -> list[float]:
    """Word-level column inference for a borderless table — the word
    path of extractStructure (detectPdfTables.js:2782-3042), driven by
    the candidate's detected rows (the reference iterates table.rows,
    not a bbox scan):

    - rows before the first data row (>= 2 numeric tokens or a
      currency symbol) are excluded from clustering but their words
      count toward column coverage as header rows;
    - narrative rows (a line wider than half the candidate that reads
      as prose) are skipped, unless the narrative line is pure text
      and a sibling line in the row carries numerics (:2852-2868);
    - per row, cells come from :func:`_merge_row_cells` (currency
      chains, digit-no-merge, leader absorption), in spatial order;
    - 1-D interval clustering (calcColumnBounds) over all cell boxes;
    - columns with zero data-row coverage, or fewer than
      max(2, 25% of data rows) total (data + header) hits, are pruned
      into their neighbor (:2950-3040)."""
    from ..tables import calc_column_bounds

    class _Box:
        __slots__ = ("left", "right")

        def __init__(self, left, right):
            self.left = left
            self.right = right

    lines = page.lines
    bbox = table["bbox"]
    rows = sorted(table.get("rows") or [], key=lambda r: r["y"])
    first_data = -1
    for ri, r in enumerate(rows):
        n_data = 0
        has_cur = False
        for i in r["line_indices"]:
            for w in lines[i].words:
                if _is_data_value_word(w.text):
                    n_data += 1
                if _CURRENCY_RE.match(w.text):
                    has_cur = True
        if n_data >= 2 or has_cur:
            first_data = ri
            break
    cand_w = bbox.right - bbox.left
    all_cells: list[dict] = []
    for ri, r in enumerate(rows):
        if first_data >= 0 and ri < first_data:
            continue
        has_narrative = False
        for i in r["line_indices"]:
            line = lines[i]
            lw = line.bbox.right - line.bbox.left
            if cand_w > 0 and lw > cand_w * 0.5 \
                    and _is_narrative_line(line):
                if len(r["line_indices"]) > 1 \
                        and _line_is_pure_text(line):
                    other_numeric = any(
                        _is_data_value_word(w.text)
                        or _CURRENCY_RE.match(w.text)
                        for j in r["line_indices"] if j != i
                        for w in lines[j].words)
                    if other_numeric:
                        continue
                has_narrative = True
                break
        if has_narrative:
            continue
        words = [w for i in r["line_indices"] for w in lines[i].words]
        if not words:
            continue
        hs = [lines[i].bbox.bottom - lines[i].bbox.top
              for i in r["line_indices"]
              if lines[i].bbox.bottom > lines[i].bbox.top]
        avg_h = sum(hs) / len(hs) if hs else 20.0
        all_cells.extend(_merge_row_cells(words, avg_h))
    if len(all_cells) < 2:
        return []
    bounds = [list(b) for b in calc_column_bounds(
        [_Box(c["left"], c["right"]) for c in all_cells])]

    # low-coverage column pruning (:2950-3040): data rows come from
    # y-clustering the merged cells; header rows (pre-data rows with
    # 2+ line fragments, plus the detected header band above the
    # bbox) count toward coverage but cannot carry a column alone
    if len(bounds) > 2:
        y_rows: list[dict] = []
        for c in all_cells:
            for yr in y_rows:
                if abs(c["top"] - yr["y"]) < 10:
                    yr["cells"].append(c)
                    break
            else:
                y_rows.append({"y": c["top"], "cells": [c]})
        header_rows: list[dict] = []

        def _add_header_word(w):
            for yr in header_rows:
                if abs(w.bbox.top - yr["y"]) < 10:
                    yr["cells"].append(
                        {"left": w.bbox.left, "right": w.bbox.right})
                    return
            header_rows.append({
                "y": w.bbox.top,
                "cells": [{"left": w.bbox.left, "right": w.bbox.right}]})

        if first_data > 0:
            for r in rows[:first_data]:
                if len(r["line_indices"]) < 2:
                    continue
                for i in r["line_indices"]:
                    for w in lines[i].words:
                        _add_header_word(w)
        headers = table.get("headers")
        if headers and headers.get("band_top") is not None \
                and headers.get("band_bottom") is not None:
            h_top, h_bot = headers["band_top"], headers["band_bottom"]
            for line in lines:
                if not (h_top <= line.bbox.top < h_bot):
                    continue
                if line.bbox.top >= bbox.top:
                    continue
                if line.bbox.right < bbox.left \
                        or line.bbox.left > bbox.right:
                    continue
                for w in line.words:
                    _add_header_word(w)

        floor_n = max(2, int(len(y_rows) * 0.25))

        def _covered(col, cells):
            return any(col[0] <= (c["left"] + c["right"]) / 2 <= col[1]
                       for c in cells)

        c = len(bounds) - 1
        while c >= 0 and len(bounds) > 2:
            data_hits = sum(1 for yr in y_rows
                            if _covered(bounds[c], yr["cells"]))
            head_hits = sum(1 for yr in header_rows
                            if _covered(bounds[c], yr["cells"]))
            if data_hits == 0 or data_hits + head_hits < floor_n:
                if c == 0:
                    bounds[1][0] = bounds[0][0]
                else:
                    bounds[c - 1][1] = bounds[c][1]
                del bounds[c]
            c -= 1

    return [(bounds[i][1] + bounds[i + 1][0]) / 2
            for i in range(len(bounds) - 1)]


def extract_structure(page, table: dict, v_lines=()) -> None:
    """extractStructure (detectPdfTables.js:2728-3093): column
    separators for a validated table. Path-derived separators
    (grid / segmented-hline / header-rule) are authoritative and
    skip inference. Otherwise word-cluster the rows, then:

    - a strong header's anchor-midpoint separators (plus a
      synthesized label-column separator when data sits left of the
      first anchor) REPLACE the clustering result when it
      under-counts a sparse table (< 3 seps, header found more),
      over-splits (>= 2x the header count), or over-splits a
      row-band table at all (:3043-3062);
    - a row-band region's fill-derived colXs replace text-inferred
      separators only when the text columns include a narrow outlier
      (< 30% of the median column width) and the fills give >= 3
      columns (:3065-3090) — the fills flow through the region
      attached to the candidate, not a copied separator list.

    ``v_lines`` enables the vLine-first path (:2739-2748 via
    correlatePathsWithCandidate :1901-1908): verticals overlapping
    >= 20% of the candidate's height, clustered at tolerance 10,
    whose interior positions become the separators outright."""
    if table.get("col_separators"):
        return
    bbox = table["bbox"]
    cand_vls = [
        vl for vl in v_lines
        if bbox.left - 5 <= vl["x"] <= bbox.right + 5
        and (min(vl["bottom"], bbox.bottom)
             - max(vl["top"], bbox.top))
        > (bbox.bottom - bbox.top) * 0.2]
    if len(cand_vls) >= 2:
        interior = [x for x in _cluster(
            [vl["x"] for vl in cand_vls], 10)
            if bbox.left + 5 < x < bbox.right - 5]
        if interior:
            table["col_separators"] = sorted(interior)
            return
    headers = table.get("headers")
    header_seps = None
    if headers and headers.get("confidence") == "strong" \
            and len(headers.get("anchors") or []) >= 2:
        anchors = sorted(headers["anchors"])
        seps = [(anchors[i] + anchors[i + 1]) / 2
                for i in range(len(anchors) - 1)]
        left_guard = anchors[0] - 10
        has_label = any(
            page.lines[i].bbox.right < left_guard
            for r in table.get("rows") or [] for i in r["line_indices"])
        if has_label:
            half = (anchors[1] - anchors[0]) / 2
            label_sep = anchors[0] - half
            if label_sep > bbox.left + 5 \
                    and anchors[0] - bbox.left > half * 2:
                seps.insert(0, label_sep)
        header_seps = sorted(seps)

    seps = infer_unruled_columns(page, table)
    if header_seps:
        sparse_under = len(header_seps) > len(seps) and len(seps) < 3
        over_split = (len(header_seps) < len(seps)
                      and len(header_seps) >= 2
                      and len(header_seps) <= len(seps) * 0.5)
        row_band_over = (table["method"] == "row-band"
                         and len(header_seps) >= 2
                         and len(header_seps) < len(seps))
        if sparse_under or over_split or row_band_over:
            seps = header_seps
    table["col_separators"] = seps

    rbr = table.get("row_band")
    if rbr and rbr.get("col_xs") and table["col_separators"]:
        fill_seps = sorted(rbr["col_xs"])
        widths = []
        prev = bbox.left
        for s in table["col_separators"]:
            widths.append(s - prev)
            prev = s
        widths.append(bbox.right - prev)
        widths.sort()
        median_w = widths[len(widths) // 2]
        if median_w > 0 and widths[0] < median_w * 0.3 \
                and len(fill_seps) + 1 >= 3:
            table["col_separators"] = fill_seps



def detect_table_header(page, table: dict) -> dict | None:
    """Header association for a borderless table (detectHeaders,
    detectPdfTables.js:2470-2726, rule-1 core): walk upward from the
    first data row through header-like rows (all-text with >= 2 cells,
    or a single cell of <= 4 alphabetic words), pick the all-text row
    with the most cells (>= 3) as the primary header, keep only cells
    that align with a data word, and report strong confidence at >= 4
    aligned anchors. Row geometry comes from the candidate's detected
    rows (the reference consults table.rows, :2473-2485), not a bbox
    scan — the bbox arrives pre-expanded from Phase 2."""
    bbox = table["bbox"]
    if not table.get("rows"):
        return None
    row_tops = sorted(r["y"] for r in table["rows"])
    if len(row_tops) > 1:
        spacings = sorted(
            row_tops[i + 1] - row_tops[i] for i in range(len(row_tops) - 1))
        avg_pitch = spacings[len(spacings) // 2]
    else:
        avg_pitch = 50.0
    first_row_y = row_tops[0]
    lookback = first_row_y - avg_pitch * 10
    row_idx = {i for r in table["rows"] for i in r["line_indices"]}

    above = [
        l for li, l in enumerate(page.lines)
        if li not in row_idx
        and lookback <= l.bbox.top < first_row_y
        and not (l.bbox.right < bbox.left or l.bbox.left > bbox.right)]
    if not above:
        return None
    groups: list[dict] = []
    for line in above:
        for g in groups:
            if abs(g["y"] - line.bbox.top) < 5:
                g["lines"].append(line)
                break
        else:
            groups.append({"y": line.bbox.top, "lines": [line]})
    annotated = []
    for g in sorted(groups, key=lambda g: -g["y"]):
        words = [w for line in g["lines"] for w in line.words]
        cells = _phrase_merge(words)
        n_data = sum(
            1 for w in words if _is_data_value_word(w.text))
        n_alpha = sum(1 for w in words if _ALPHA_RE.search(w.text))
        annotated.append({
            "y": g["y"], "cells": cells,
            "all_text": n_data == 0, "mostly_text": n_alpha > n_data})

    def _header_like(a) -> bool:
        if len(a["cells"]) >= 2:
            return a["all_text"]
        if len(a["cells"]) == 1:
            n_alpha = sum(1 for w in a["cells"][0][2]
                          if _ALPHA_RE.search(w.text))
            return a["mostly_text"] and n_alpha <= 4
        return False

    band_top = first_row_y
    last_y = first_row_y
    for a in annotated:
        # introductory prose ("...were as follows:") terminates the
        # upward walk — only the literal trailing token is checked, so
        # legitimate sub-headers like "Deferred:" keep chaining
        # (refineTableTop, detectPdfTables.js:3235-3241)
        row_last = a["cells"][-1][2][-1] if a["cells"] \
            and a["cells"][-1][2] else None
        if row_last is not None and row_last.text == "follows:":
            break
        if not _header_like(a):
            continue
        if last_y - a["y"] > avg_pitch * 2:
            break
        band_top = a["y"]
        last_y = a["y"]

    best = None
    for a in annotated:
        if not a["all_text"] or len(a["cells"]) < 3:
            continue
        if best is None or len(a["cells"]) > len(best["cells"]):
            best = a

    # Rule 2 (detectHeaders :2609-2664): stacked 2-cell headers. When
    # no single row has 3+ cells, 2+ all-text rows of exactly two
    # cells sharing x-positions (within 15% of the table width) are
    # the annual-report "As at / 31st March / (Rs. in Crores)"
    # pattern — the cross-row alignment is the structural signal.
    best_cells = [ (c[0], c[1]) for c in best["cells"] ] if best else None
    from_stacked = False
    if best_cells is None:
        two_cell = [a for a in annotated
                    if a["all_text"] and len(a["cells"]) == 2]
        if len(two_cell) >= 2:
            x_tol = (bbox.right - bbox.left) * 0.15
            ref = two_cell[0]
            ref_lc = (ref["cells"][0][0] + ref["cells"][0][1]) / 2
            ref_rc = (ref["cells"][1][0] + ref["cells"][1][1]) / 2
            sums, n = [0.0, 0.0], 0
            for a in two_cell:
                lc = (a["cells"][0][0] + a["cells"][0][1]) / 2
                rc = (a["cells"][1][0] + a["cells"][1][1]) / 2
                if abs(lc - ref_lc) < x_tol and abs(rc - ref_rc) < x_tol:
                    sums[0] += lc
                    sums[1] += rc
                    n += 1
            if n >= 2:
                from_stacked = True
                best_cells = [(sums[0] / n - 50, sums[0] / n + 50),
                              (sums[1] / n - 50, sums[1] / n + 50)]

    if best_cells is None:
        if band_top >= first_row_y:
            return None
        return {"anchors": [], "band_top": band_top,
                "band_bottom": first_row_y, "confidence": "weak"}

    data_words = [
        w for r in table["rows"] for i in r["line_indices"]
        for w in page.lines[i].words]
    aligned = []
    for left, right in best_cells:
        for w in data_words:
            wc = (w.bbox.left + w.bbox.right) / 2
            if left - 5 <= wc <= right + 5:
                aligned.append((left + right) / 2)
                break
    min_anchors = 2 if from_stacked else 4
    confidence = ("strong"
                  if len(aligned) >= min_anchors
                  and len(aligned) >= len(best_cells) * 0.5
                  else "weak")
    return {"anchors": aligned, "band_top": band_top,
            "band_bottom": first_row_y, "confidence": confidence}


_NUMERIC_TAIL_RE = re.compile(r"[\d)%]$")
_SENTENCE_END_RE = re.compile(r"[.!?:]$")


def _last_word_text(line) -> str:
    return line.words[-1].text if line.words else ""


def refine_table_top(table: dict, lines, h_lines: list[dict],
                     top_floor: float = 0.0) -> None:
    """Phase 5.5 top-boundary refinement (refineTableTop,
    detectPdfTables.js:3095-3352): replace the generous Phase-2
    expansion with a precise top. A strong header band is
    authoritative (minus colon-prose pushes); otherwise chain upward
    from the first data row (skipping leading wide/sentence-end
    single-line rows), anchored at the closest hLine within 1.5 row
    pitches, accepting multi-segment rows within 2.5x the median row
    pitch and narrow single-segment rows within 0.45x, stopping at
    'follows:' prose / wide paragraphs / page-margin-left lines /
    x-disjoint narrow rows; then push the result past straddling,
    'follows:'-ending and wide-paragraph lines, and past leading
    all-'follows:' rows."""
    rows = table["rows"]
    if not rows:
        return
    bbox = table["bbox"]
    headers = table.get("headers")
    first_data_y = min(r["y"] for r in rows)
    if headers and headers.get("confidence") == "strong":
        strong_top = max(top_floor, headers["band_top"] - 5)
        for line in lines:
            if line.bbox.top < strong_top \
                    or line.bbox.top >= first_data_y:
                continue
            if line.bbox.right < bbox.left \
                    or line.bbox.left > bbox.right:
                continue
            if _last_word_text(line) == "follows:" \
                    and line.bbox.bottom > strong_top:
                strong_top = line.bbox.bottom + 1
        table["bbox"] = Bbox(bbox.left, strong_top, bbox.right,
                             bbox.bottom)
        return

    sorted_rows = sorted(rows, key=lambda r: r["y"])
    cand_w = bbox.right - bbox.left
    # skip leading wide / sentence-ending single-line rows: prose that
    # slipped into the candidate must not anchor the scan
    first_idx = 0
    while first_idx < len(sorted_rows) - 1:
        r = sorted_rows[first_idx]
        if len(r["line_indices"]) != 1:
            break
        line = lines[r["line_indices"][0]]
        last = _last_word_text(line)
        if is_num_token(last) and _DIGIT_RE.search(last) \
                and _NUMERIC_TAIL_RE.search(last):
            break
        wide = (line.bbox.right - line.bbox.left) > cand_w * 0.5
        sentence_end = bool(_SENTENCE_END_RE.search(last)) \
            and len(line.words) >= 3
        if not wide and not sentence_end:
            break
        first_idx += 1
    first_row_y = sorted_rows[first_idx]["y"]
    avg_rh = 50.0
    if len(sorted_rows) > 1:
        spac = sorted(sorted_rows[i]["y"] - sorted_rows[i - 1]["y"]
                      for i in range(1, len(sorted_rows)))
        avg_rh = spac[len(spac) // 2]
    all_idx = {i for r in rows for i in r["line_indices"]}

    # scan anchor: the CLOSEST hLine above the first row (within 1.5
    # pitches) marks the header/data boundary
    scan_anchor = first_row_y
    hl_limit = first_row_y - avg_rh * 1.5
    for hl in h_lines:
        if hl["right"] < bbox.left or hl["left"] > bbox.right:
            continue
        if hl_limit < hl["y"] < first_row_y:
            if scan_anchor == first_row_y or hl["y"] > scan_anchor:
                scan_anchor = hl["y"]

    data_left = min((lines[i].bbox.left
                     for r in rows for i in r["line_indices"]),
                    default=float("inf"))

    def _is_multi_segment(li: int, line) -> bool:
        return any(
            lj != li and abs(lines[lj].bbox.top - line.bbox.top) < 5
            and lines[lj].bbox.right >= bbox.left
            and lines[lj].bbox.left <= bbox.right
            for lj in range(len(lines)))

    above = [(li, line) for li, line in enumerate(lines)
             if li not in all_idx and line.bbox.top < first_row_y
             and line.bbox.bottom > top_floor
             and not (line.bbox.right < bbox.left
                      or line.bbox.left > bbox.right)]
    above.sort(key=lambda t: -t[1].bbox.top)  # bottom-up

    header_top = scan_anchor
    single_range: list[float] | None = None
    for li, line in above:
        if _last_word_text(line) == "follows:":
            break
        line_w = line.bbox.right - line.bbox.left
        gap = header_top - line.bbox.bottom
        if _is_multi_segment(li, line):
            if gap > avg_rh * 2.5:
                break
            header_top = min(header_top, line.bbox.top)
            single_range = None
            continue
        if gap > avg_rh * 0.45:
            continue
        if line_w > cand_w * 0.6:
            break
        if line.bbox.left < data_left - 20:
            break
        if single_range and (line.bbox.right < single_range[0]
                             or line.bbox.left > single_range[1]):
            break
        header_top = min(header_top, line.bbox.top)
        if line_w <= cand_w * 0.5:
            if single_range is None:
                single_range = [line.bbox.left, line.bbox.right]
            else:
                single_range[0] = min(single_range[0], line.bbox.left)
                single_range[1] = max(single_range[1], line.bbox.right)

    final_top = max(top_floor, header_top - 5)

    # post-scan cleanup: push past straddling lines, 'follows:' prose
    # and wide paragraph text inside [final_top, first_row_y]
    pushed = True
    while pushed:
        pushed = False
        for li, line in enumerate(lines):
            if li in all_idx:
                continue
            if line.bbox.right < bbox.left or line.bbox.left > bbox.right:
                continue
            if line.bbox.bottom <= final_top \
                    or line.bbox.top >= first_row_y:
                continue
            if line.bbox.top < final_top:
                final_top = line.bbox.bottom + 1
                pushed = True
                continue
            if _last_word_text(line) == "follows:":
                final_top = line.bbox.bottom + 1
                pushed = True
                continue
            line_w = line.bbox.right - line.bbox.left
            if not _is_multi_segment(li, line) and line_w > cand_w * 0.6:
                final_top = line.bbox.bottom + 1
                pushed = True

    # leading rows made entirely of 'follows:' lines are intro prose
    # that shares the header row's y — push past them
    for r in sorted_rows:
        if r["y"] > final_top + avg_rh * 1.5:
            break
        all_follows = bool(r["line_indices"]) and all(
            not lines[i].words
            or lines[i].words[-1].text == "follows:"
            for i in r["line_indices"])
        if all_follows:
            row_bot = max(lines[i].bbox.bottom
                          for i in r["line_indices"])
            if row_bot > final_top:
                final_top = row_bot + 1
        else:
            break

    table["bbox"] = Bbox(bbox.left, final_top, bbox.right, bbox.bottom)


def columns_from_separators(bbox: Bbox, seps: list[float]) -> list[Bbox]:
    """Column bound boxes from interior separator xs."""
    edges = [bbox.left] + sorted(seps) + [bbox.right]
    return [Bbox(edges[i], bbox.top, edges[i + 1], bbox.bottom)
            for i in range(len(edges) - 1)]


def bbox_overlap(a: Bbox, b: Bbox) -> float:
    """Intersection area over the smaller box's area
    (bboxOverlap, detectPdfTables.js:4080-4091)."""
    ol, ot = max(a.left, b.left), max(a.top, b.top)
    o_r, ob = min(a.right, b.right), min(a.bottom, b.bottom)
    if o_r <= ol or ob <= ot:
        return 0.0
    min_area = min((a.right - a.left) * (a.bottom - a.top),
                   (b.right - b.left) * (b.bottom - b.top))
    return ((o_r - ol) * (ob - ot)) / min_area if min_area > 0 else 0.0


def detect_pdf_table_regions(page, paths, scale: float,
                             page_h_pts: float) -> list[dict]:
    """Composite PDF-side detector: strict ruled grids (one per rule
    component) first, then segmented-hline tables and header-rule
    tables not already covered by a grid, then borderless numeric
    clusters. Borderless tables get word-cluster column separators
    and, when a header block sits above, the band extends over it
    (extractStructure + detectHeaders). Every table gets a Phase-5.55
    title scan; non-grid candidates pass Phase-6 stream-order
    validation."""
    if len(page.lines) < 3:
        return []
    if len(paths) > MAX_TABLE_DETECTION_PATHS:
        paths = []
    h_lines, v_lines, filled_rects, header_fills = classify_rule_lines(
        paths, scale, page_h_pts, page)
    reconstitute_dashed_lines(paths, h_lines, v_lines, scale,
                              page_h_pts, page.dims["height"])
    # strict grids use the more inclusive segment extraction so grids
    # drawn as per-cell stroked rectangles detect (detectStrictGrids
    # :2169-2172 feeds extractGridSegments, not classifyPaths)
    gh, gv = extract_grid_segments(paths, scale, page_h_pts)
    tables = detect_strict_grids(
        merge_collinear_segments(gh, "y", "left", "right"),
        merge_collinear_segments(gv, "x", "top", "bottom"), page)

    def _overlaps(a: Bbox, b: Bbox) -> bool:
        return not (a.right < b.left or b.right < a.left
                    or a.bottom < b.top or b.bottom < a.top)

    for st in detect_segmented_hline_grids(page, h_lines, v_lines,
                                           header_fills):
        if not any(bbox_overlap(st["bbox"], t["bbox"]) > 0.3
                   for t in tables):
            if validate_stream_order(st, page.lines):
                tables.append(st)

    for hr in detect_header_rule_tables(h_lines, page):
        if not any(_overlaps(hr["bbox"], t["bbox"]) for t in tables):
            tables.append(hr)

    # Phase 0 quick bail-out (detectPdfTables.js:72-100): pages with no
    # same-top line pairs are prose UNLESS a dot-leader cluster (>= 3
    # right-clustered-numeric rows within a 300 pt window) says
    # otherwise; for plain prose only the path-based detectors apply.
    # At corpus scale this gates the text-side analysis off for the
    # overwhelmingly common page shape.
    lines = page.lines
    same_y_pairs = sum(
        1 for i in range(len(lines) - 1)
        if abs(lines[i].bbox.top - lines[i + 1].bbox.top) < 5)
    if same_y_pairs == 0:
        dl_ys = sorted(ln.bbox.top for ln in lines
                       if is_right_clustered_numeric(ln.words))
        if not any(dl_ys[i + 2] - dl_ys[i] < 300
                   for i in range(len(dl_ys) - 2)):
            return _finish_tables(tables, page, h_lines)

    # Phase 1/2/4: text-side candidates (table-like row identification,
    # run/cluster grouping, validation); grid/path tables override
    # overlapping text candidates (detectPdfTables.js:296-315)
    text_cands = [
        c for c in group_rows_into_candidates(
            find_table_like_rows(page), page)
        if validate_candidate(c, page.lines)]
    for cand in text_cands:
        # grid/path tables override on AREA overlap > 0.3 (:310) —
        # the Phase-2 top expansion legitimately grazes neighbors
        if any(bbox_overlap(cand["bbox"], t["bbox"]) > 0.3
               for t in tables):
            continue
        if not validate_stream_order(cand, page.lines):
            continue
        tables.append(cand)

    # Phase 3.5/4 row-band integration (detectPdfTables.js:282-287,
    # 320-446), keyed on the CANDIDATE like the reference: a candidate
    # matching exactly one region adopts it (bbox union; column
    # anchors flow through extract_structure below, :352-384); a
    # candidate spanning SEVERAL regions splits into one table per
    # region when the regions are substantial (3+ with 5+ bands) or
    # every adjacent pair is separated by a multi-fragment header row
    # (:388-440); an unmatched region with >= 8 bands stands alone.
    rbrs = [r for r in extract_row_band_structure(filled_rects)
            if r["right"] - r["left"] >= page.dims["width"] * 0.3]
    region_matches = {
        id(rbr): [t for t in tables
                  if bbox_overlap(
                      t["bbox"],
                      Bbox(rbr["left"], rbr["top"], rbr["right"],
                           rbr["bottom"])) > 0.3]
        for rbr in rbrs}
    cand_regions: dict[int, list] = {}
    for rbr in rbrs:
        for t in region_matches[id(rbr)]:
            cand_regions.setdefault(id(t), []).append(rbr)

    def _adopt(t, rbr):
        prev_left = t["bbox"].left
        t["bbox"] = Bbox(
            min(t["bbox"].left, rbr["left"]),
            min(t["bbox"].top, rbr["top"]),
            max(t["bbox"].right, rbr["right"]),
            max(t["bbox"].bottom, rbr["bottom"]))
        t["row_band"] = rbr
        if t["method"] in ("header-rule", "segmented-hline"):
            # leftward extension past path-derived columns keeps
            # the old left edge as a label-column separator (:370)
            if t["bbox"].left < prev_left - 5:
                seps = list(t.get("col_separators") or [])
                seps.insert(0, prev_left)
                t["col_separators"] = sorted(seps)
        else:
            t["method"] = "row-band"
        t["rows"] = _region_rows(page, t["bbox"])

    def _header_row_between(t, top: float, bottom: float) -> bool:
        """A y-group of >= 2 line fragments inside the gap — a new
        table's column-header band (:400-425)."""
        groups: list[list[float]] = []
        for line in page.lines:
            if not (top <= line.bbox.top < bottom):
                continue
            if line.bbox.right < t["bbox"].left \
                    or line.bbox.left > t["bbox"].right:
                continue
            for g in groups:
                if abs(g[0] - line.bbox.top) < 5:
                    g[1] += 1
                    break
            else:
                groups.append([line.bbox.top, 1])
        return any(n >= 2 for _y, n in groups)

    for t in list(tables):
        regions = cand_regions.get(id(t))
        if not regions or t["method"] == "grid":
            continue
        if len(regions) == 1:
            _adopt(t, regions[0])
            continue
        srt = sorted(regions, key=lambda r: r["top"])
        should_split = (len(regions) >= 3
                        and all(len(r["row_ys"]) >= 5
                                for r in regions))
        if not should_split and all(len(r["row_ys"]) >= 2
                                    for r in regions):
            should_split = all(
                _header_row_between(t, srt[i - 1]["bottom"],
                                    srt[i]["top"])
                for i in range(1, len(srt)))
        if not should_split:
            continue
        idx = tables.index(t)
        splits = [c for rbr in srt
                  for c in make_row_band_candidates(rbr, t, page)
                  if validate_stream_order(c, page.lines)]
        tables[idx:idx + 1] = splits
    for rbr in rbrs:
        if not region_matches[id(rbr)] and len(rbr["row_ys"]) >= 8:
            for c in make_row_band_candidates(rbr, None, page):
                if validate_stream_order(c, page.lines):
                    tables.append(c)

    # Header detection runs FIRST (:459-462): extract_structure and
    # refine_table_top consult table["headers"] as a first-class
    # signal instead of re-deriving header evidence ad-hoc.
    for t in tables:
        if t["method"] == "grid":
            t["headers"] = None
            continue
        t["headers"] = detect_table_header(page, t)
        # the exported header label reflects bands the table actually
        # CONSUMES: path-derived tops (segmented-hline / header-rule
        # without an attached row band) ignore the band, so they stay
        # 'none' even though headers are computed for completeness
        consumed = t.get("row_band") or t["method"] not in (
            "segmented-hline", "header-rule")
        t["header"] = t["headers"]["confidence"] \
            if t["headers"] and consumed else "none"
    for t in tables:
        t.setdefault("header", "none")
        extract_structure(page, t, v_lines)

    # Phase 5.4 sibling split (detectPdfTables.js:560-640): a row-band
    # candidate whose data rows fall into exactly two groups across a
    # wide gap (> 2x median pitch and > 50), BOTH closing with a
    # 'Total ...' row, is two stacked sibling tables sharing one
    # header rule / band stripe. Splits inherit column structure; the
    # non-first split's top is locked so refine cannot chain it back
    # through the sibling.
    split_work = []
    for t in tables:
        if not t.get("row_band") or len(t.get("rows") or []) < 4:
            continue
        srt = sorted(t["rows"], key=lambda r: r["y"])
        spac = [srt[i2]["y"] - srt[i2 - 1]["y"]
                for i2 in range(1, len(srt))]
        med = sorted(spac)[len(spac) // 2]
        groups = [[0, 0]]
        for i2 in range(1, len(srt)):
            if spac[i2 - 1] > med * 2 and spac[i2 - 1] > 50:
                groups.append([i2, i2])
            else:
                groups[-1][1] = i2
        if len(groups) != 2:
            continue

        def _ends_total(row):
            return any(_TOTAL_RE.match(" ".join(
                w.text for w in page.lines[li].words).strip())
                for li in row["line_indices"])

        if not (_ends_total(srt[groups[0][1]])
                and _ends_total(srt[groups[1][1]])):
            continue
        splits = []
        for gi, (s, e) in enumerate(groups):
            grows = srt[s:e + 1]
            top = t["bbox"].top if gi == 0 else grows[0]["y"]
            bottom = t["bbox"].bottom if gi == len(groups) - 1 \
                else max(page.lines[li].bbox.bottom
                         for r in grows
                         for li in r["line_indices"]) + 5
            splits.append({
                "bbox": Bbox(t["bbox"].left, top,
                             t["bbox"].right, bottom),
                "rows": grows,
                "col_separators": list(t.get("col_separators") or []),
                "method": t["method"],
                "row_band": t.get("row_band"),
                "headers": None, "header": "none",
                "split_top_locked": gi > 0,
            })
        split_work.append((t, splits))
    for orig, splits in split_work:
        idx = tables.index(orig)
        tables[idx:idx + 1] = splits

    # Phase 5.5: refine table tops now that path data is in. Path
    # methods carry authoritative tops and are exempt unless a
    # row-band region was attached; stacked siblings floor the scan
    # at the neighbor's bottom, compared against the FIRST DATA ROW
    # (bbox.top was inflated in Phase 2, :667-683).
    for t in tables:
        if t["method"] == "grid" or t.get("split_top_locked"):
            continue
        has_band = bool(t.get("row_band"))
        if not has_band and t["method"] in ("segmented-hline",
                                            "header-rule"):
            continue
        my_first = min((r["y"] for r in t.get("rows") or []),
                       default=t["bbox"].top)
        top_floor = 0.0
        for other in tables:
            if other is t:
                continue
            ob = other["bbox"]
            if ob.bottom <= my_first and ob.bottom > top_floor \
                    and ob.right >= t["bbox"].left \
                    and ob.left <= t["bbox"].right:
                top_floor = ob.bottom
        refine_table_top(t, page.lines, h_lines, top_floor)
        t["rows"] = _region_rows(page, t["bbox"])
    return _finish_tables(tables, page, h_lines)


def find_disjoint_rule_clusters(h_lines, page) -> list[dict]:
    """y-bands of >= 2 mutually disjoint horizontal segments spanning
    >= 20% of the page width (findDisjointRuleClusters,
    detectPdfTables.js:3602-3635) — authoritative column geometry for
    Phase 5.7."""
    y_groups: list[dict] = []
    for hl in h_lines:
        for g in y_groups:
            if abs(g["y"] - hl["y"]) <= 3:
                g["lines"].append(hl)
                g["y"] = sum(l["y"] for l in g["lines"]) \
                    / len(g["lines"])
                break
        else:
            y_groups.append({"y": hl["y"], "lines": [hl]})
    clusters = []
    for g in y_groups:
        if len(g["lines"]) < 2:
            continue
        srt = sorted(g["lines"], key=lambda l: l["left"])
        if any(srt[i]["left"] < srt[i - 1]["right"] - 1
               for i in range(1, len(srt))):
            continue
        if srt[-1]["right"] - srt[0]["left"] \
                < page.dims["width"] * 0.2:
            continue
        clusters.append({"y": g["y"],
                         "cols": [(l["left"], l["right"])
                                  for l in srt]})
    return clusters


def refine_text_columns_from_rules(tables: list[dict], page,
                                   h_lines) -> None:
    """Phase 5.7 (detectPdfTables.js:735-762): a disjoint rule cluster
    inside a text-derived table carries authoritative column geometry;
    replace word-clustering separators with rule-gap midpoints (plus a
    synthesized label-column separator when the table extends left of
    the leftmost rule) unless the text found strictly MORE columns."""
    clusters = find_disjoint_rule_clusters(h_lines, page)
    if not clusters:
        return
    for t in tables:
        if t["method"] not in ("text", "numeric"):
            continue
        bbox = t["bbox"]
        best = None
        for cl in clusters:
            if cl["y"] < bbox.top - 30 or cl["y"] > bbox.bottom + 30:
                continue
            if cl["cols"][0][0] < bbox.left - 30:
                continue
            if cl["cols"][-1][1] > bbox.right + 30:
                continue
            if best is None or len(cl["cols"]) > len(best["cols"]):
                best = cl
        if best is None:
            continue
        synth_label = bbox.left < best["cols"][0][0] - 20
        new_cols = len(best["cols"]) + (1 if synth_label else 0)
        if len(t.get("col_separators") or []) + 1 > new_cols:
            continue
        seps = [best["cols"][0][0]] if synth_label else []
        for i in range(1, len(best["cols"])):
            seps.append((best["cols"][i - 1][1]
                         + best["cols"][i][0]) / 2)
        t["col_separators"] = sorted(seps)


def _finish_tables(tables: list[dict], page,
                   h_lines=()) -> list[dict]:
    """Shared tail: Phase-5.6 adjacent-content extension, Phase-5.7
    rule-cluster column refinement, Phase-5.55 title scan, stable
    top-down order."""
    for t in tables:
        extend_table_to_adjacent_content(t, page, tables)
    refine_text_columns_from_rules(tables, page, h_lines)
    for t in tables:
        t["title"] = detect_table_title(t, page.lines)
    tables.sort(key=lambda t: (t["bbox"].top, t["bbox"].left))
    return tables
