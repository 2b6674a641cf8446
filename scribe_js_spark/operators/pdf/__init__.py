"""PDF text-layer extraction engine.

A from-scratch pure-Python PDF parser covering the text path of the
reference's engine (/root/reference/js/pdf/): xref tables + xref
streams, object/stream decode (FlateDecode + PNG predictors), content
stream tokenization, font dictionaries (ToUnicode CMaps, encoding
differences, widths), the Tm/Td/TJ text-state machine, and the
chars -> lines -> words grouping pass.

Also covered here: encryption (crypto.py — RC4, AES-128, AES-256/R6),
vector paths + underline detection (paths.py), table detection
(tables_pdf.py), annotations, struct trees, outlines, metadata, and
image-XObject inventory and page subset/merge (subset.py). The text
layer never decodes pixels (SURVEY.md §7) — real PNG/JPEG/GIF/TIFF
decoders live in textops/ for the multimodal path; Type3 glyphs carry
widths/fillers through the OCR-selection gates (ocr_selection.py)
without outline hashing.
"""

from .parse import parse_pdf_document  # noqa: F401
