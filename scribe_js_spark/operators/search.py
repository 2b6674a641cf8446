"""Word-stream search operators.

Port of /root/reference/js/objects/ocrObjects.js:854-980: sliding
multi-word windows over the page word stream, case-insensitive
substring match of the joined window; getDocMatches yields one entry
per non-overlapping occurrence (the window advances past a match).
"""

from __future__ import annotations

from ..model import OcrPage


def _page_words(page: OcrPage):
    return [w for line in page.lines for w in line.words]


def get_matching_words(text: str, page: OcrPage) -> list:
    """Words participating in any (possibly overlapping) match on a
    page (getMatchingWords)."""
    text = text.strip().lower()
    if not text:
        return []
    text_arr = text.split(" ")
    words = _page_words(page)
    out = []
    for i in range(len(words) - (len(text_arr) - 1)):
        if text_arr[0] not in words[i].text.lower():
            continue
        cand = words[i : i + len(text_arr)]
        cand_text = " ".join(w.text for w in cand).lower()
        if text in cand_text:
            out.extend(cand)
    return out


def get_matching_word_ids(text: str, page: OcrPage) -> list[str]:
    return [w.id for w in get_matching_words(text, page)]


def get_doc_matches(text: str, pages: list[OcrPage]) -> list[dict]:
    """Non-overlapping doc-wide matches in reading order
    (getDocMatches)."""
    text = text.strip().lower()
    if not text:
        return []
    text_arr = text.split(" ")
    matches = []
    for page in pages:
        if page is None:
            continue
        words = _page_words(page)
        i = 0
        while i <= len(words) - len(text_arr):
            if text_arr[0] not in words[i].text.lower():
                i += 1
                continue
            cand = words[i : i + len(text_arr)]
            cand_text = " ".join(w.text for w in cand).lower()
            if text in cand_text:
                matches.append({
                    "pageN": page.n,
                    "wordIds": [w.id for w in cand],
                })
                i += len(text_arr)
            else:
                i += 1
    return matches
