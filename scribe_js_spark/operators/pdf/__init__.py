"""PDF text-layer extraction engine.

A from-scratch pure-Python PDF parser covering the text path of the
reference's engine (/root/reference/js/pdf/): xref tables + xref
streams, object/stream decode (FlateDecode + PNG predictors), content
stream tokenization, font dictionaries (ToUnicode CMaps, encoding
differences, widths), the Tm/Td/TJ text-state machine, and the
chars -> lines -> words grouping pass.

Image codecs, encryption, Type3 glyph hashing and table detection are
out of scope for the text layer (SURVEY.md §7 phase 3 deferrals).
"""

from .parse import parse_pdf_document  # noqa: F401
