"""Main-content extraction for raw web HTML (boilerplate strip).

The reference engine ingests OCR/PDF documents; the Common-Crawl-style
input table this engine targets (url, warc_ts, html, ...) also carries
raw web pages, and the north rule calls for HTML boilerplate stripping
with DOM heuristics. This converter applies the standard
readability/jusText-family approach with no third-party dependency:

- DOM-lite parse (html.parser), dropping script/style/noscript/
  template/svg/iframe subtrees and comments;
- landmark boilerplate removal (nav/header/footer/aside/form) plus
  id/class-pattern removal (menu/sidebar/banner/comment/share/ad...)
  gated on high link density or negligible text, so a <header> that
  actually wraps the article is not destroyed;
- content-root selection: the candidate (article, main, #content-like
  containers, body fallback) with the greatest non-link text mass;
- block-level paragraph emission with entity unescaping and whitespace
  normalization, dropping residual link-farm paragraphs (link density
  > 0.8).

The paragraphs then flow through the plain-text converter so the
output shares the synthetic page geometry, paragraph model, and reflow
semantics of every other text source.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_DROP_TAGS = frozenset((
    "script", "style", "noscript", "template", "svg", "iframe",
    "head", "object", "embed", "applet", "button", "select",
    "option", "canvas", "map", "video", "audio",
))
_LANDMARK_TAGS = frozenset(("nav", "header", "footer", "aside", "form"))
_BOILER_ATTR_RE = re.compile(
    r"\b(?:nav|menu|sidebar|footer|header|banner|breadcrumbs?|comments?|"
    r"share|social|related|widget|promo|ad|ads|advert\w*|cookie|popup|"
    r"subscribe|newsletter)\b", re.I)
_CONTENT_ATTR_RE = re.compile(
    r"\b(?:content|article|post|story|entry|body|main|text)\b", re.I)
_BLOCK_TAGS = frozenset((
    "p", "div", "article", "section", "main", "h1", "h2", "h3", "h4",
    "h5", "h6", "li", "ul", "ol", "dl", "dt", "dd", "table", "tr",
    "blockquote", "pre", "figure", "figcaption", "br", "hr", "body",
    "html", "center",
))
_VOID_TAGS = frozenset((
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
))
_WS_RE = re.compile(r"\s+")
_HIDDEN_STYLE_RE = re.compile(
    r"display\s*:\s*none|visibility\s*:\s*hidden", re.I)


def _is_hidden(node) -> bool:
    """Invisible-to-the-reader subtree: the HTML ``hidden`` attribute,
    ``aria-hidden="true"``, or inline display:none/visibility:hidden.
    Crawled pages park cookie modals, offscreen menus and prefetch
    text behind these, often without boilerplate-looking class names."""
    a = node.attrs
    if "hidden" in a:
        return True
    if str(a.get("aria-hidden") or "").lower() == "true":
        return True
    style = a.get("style")
    return bool(style and _HIDDEN_STYLE_RE.search(style))


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = dict(attrs or ())
        self.children: list = []
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", (), None)
        self.cur = self.root
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag in _DROP_TAGS and tag not in _VOID_TAGS:
                self._skip_depth += 1
            return
        if tag in _DROP_TAGS:
            if tag not in _VOID_TAGS:
                self._skip_depth = 1
            return
        node = _Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        if self._skip_depth or tag in _DROP_TAGS:
            return
        self.cur.children.append(_Node(tag, attrs, self.cur))

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag in _DROP_TAGS:
                self._skip_depth -= 1
            return
        # tolerant close: pop to the nearest matching open tag
        node = self.cur
        while node is not None and node.tag != tag:
            node = node.parent
        if node is not None and node.parent is not None:
            self.cur = node.parent

    def handle_data(self, data):
        if not self._skip_depth and data:
            self.cur.children.append(data)


def _text_stats(node) -> tuple[int, int]:
    """(total text chars, chars inside <a>) for a subtree."""
    total = linked = 0
    stack = [(node, node.tag == "a" if isinstance(node, _Node) else False)]
    while stack:
        cur, in_link = stack.pop()
        if isinstance(cur, str):
            n = len(_WS_RE.sub(" ", cur).strip())
            total += n
            if in_link:
                linked += n
            continue
        for child in cur.children:
            stack.append(
                (child, in_link or (isinstance(child, _Node)
                                    and child.tag == "a")))
    return total, linked


def _attr_text(node) -> str:
    return " ".join(
        str(node.attrs.get(k, "")) for k in ("id", "class", "role"))


def _prune_boilerplate(node) -> None:
    kept = []
    for child in node.children:
        if isinstance(child, str):
            kept.append(child)
            continue
        if _is_hidden(child):
            continue
        if child.tag in _LANDMARK_TAGS:
            total, linked = _text_stats(child)
            # a landmark that is mostly links (or nearly empty) is
            # chrome; a <header> wrapping the article headline is not
            if total < 40 or (total and linked / total > 0.4):
                continue
        attr = _attr_text(child)
        if _BOILER_ATTR_RE.search(attr) \
                and not _CONTENT_ATTR_RE.search(attr):
            total, linked = _text_stats(child)
            if total < 60 or (total and linked / total > 0.33):
                continue
        _prune_boilerplate(child)
        kept.append(child)
    node.children = kept


def _iter_nodes(node):
    stack = [node]
    while stack:
        cur = stack.pop()
        if isinstance(cur, _Node):
            yield cur
            stack.extend(cur.children)


def _pick_content_root(root) -> _Node:
    candidates = []
    body = None
    for node in _iter_nodes(root):
        if node.tag == "body":
            body = node
        if node.tag in ("article", "main"):
            candidates.append(node)
        elif _CONTENT_ATTR_RE.search(_attr_text(node)):
            candidates.append(node)
    pool = candidates or ([body] if body else [root])
    best, best_mass = None, -1
    for cand in pool:
        total, linked = _text_stats(cand)
        mass = total - linked
        if mass > best_mass:
            best, best_mass = cand, mass
    return best if best is not None else root


def _paragraphs(node) -> list[str]:
    """Block-boundary paragraph texts with a residual link-farm filter:
    a paragraph whose chars are > 80% inside anchors (a 'related
    articles' list that survived pruning) is dropped."""
    paras: list[tuple[str, int]] = []
    buf: list[tuple[str, bool]] = []

    def flush():
        text = _WS_RE.sub(" ", "".join(t for t, _ in buf)).strip()
        linked = sum(
            len(_WS_RE.sub(" ", t).strip()) for t, il in buf if il)
        buf.clear()
        if text:
            paras.append((text, linked))

    def walk(cur, in_link):
        if isinstance(cur, str):
            buf.append((cur, in_link))
            return
        is_block = cur.tag in _BLOCK_TAGS
        if is_block:
            flush()
        for child in cur.children:
            walk(child, in_link or cur.tag == "a")
        if is_block:
            flush()

    walk(node, False)
    flush()
    out = []
    for text, linked in paras:
        if len(text) < 3:
            continue
        if linked > len(text) * 0.8:
            continue
        out.append(text)
    return out


def extract_main_content(html_str: str) -> list[str]:
    """Boilerplate-stripped main-content paragraphs of a web page."""
    builder = _TreeBuilder()
    try:
        builder.feed(html_str)
        builder.close()
    except Exception:
        pass
    root = builder.root
    _prune_boilerplate(root)
    content = _pick_content_root(root)
    return _paragraphs(content)


def convert_doc_webhtml(html_str: str, page_dims: dict | None = None):
    """Web page -> OcrPage list via the plain-text converter (shared
    synthetic geometry and reflow semantics)."""
    from .plaintext import convert_doc_text

    paras = extract_main_content(html_str)
    return convert_doc_text("\n\n".join(paras), page_dims=page_dims)
