"""The never-fatal contract: extract_document and decode_media must
return an error value on arbitrary corruption — never raise. At corpus
scale every imaginable mutation shows up."""

import numpy as np
import pytest

from scribe_js_spark.extract import extract_document

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _base_docs():
    from scribe_js_spark.fixtures import build_doc_model, render_abbyy
    from scribe_js_spark.render_pdf import render_pdf

    model = build_doc_model(3, n_pages=1)
    return [
        render_pdf(model, rotate=False),
        render_abbyy(model).encode("utf-8"),
    ]


DOCS = _base_docs()


def _mutate(data: bytes, rng: np.random.RandomState) -> bytes:
    mode = rng.randint(4)
    b = bytearray(data)
    if mode == 0:  # flip random bytes
        for _ in range(rng.randint(1, 30)):
            b[rng.randint(len(b))] = rng.randint(256)
    elif mode == 1:  # truncate
        del b[rng.randint(1, len(b)):]
    elif mode == 2:  # delete a slice
        i = rng.randint(len(b))
        del b[i : i + rng.randint(1, 200)]
    else:  # duplicate a slice (garbage insertion)
        i = rng.randint(len(b))
        b[i:i] = b[i : i + rng.randint(1, 100)]
    return bytes(b)


def test_extract_never_raises_on_mutations():
    rng = np.random.RandomState(1234)
    failures = 0
    for _ in range(150):
        doc = DOCS[rng.randint(len(DOCS))]
        mutated = _mutate(doc, rng)
        res = extract_document(mutated)  # must not raise
        if res.error is not None:
            failures += 1
        else:
            assert isinstance(res.text, str)
    # sanity: mutations do produce both survivable and fatal inputs
    assert 0 < failures < 150


if HAVE_HYP:

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=300))
    def test_extract_never_raises_on_arbitrary_bytes(data):
        res = extract_document(data)
        assert (res.error is None) or isinstance(res.error, str)

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=300))
    def test_media_decode_one_never_crashes(data):
        import struct as _struct

        from scribe_js_spark.textops.multimodal import _decode_one

        for prefix in (b"SIMG", b"RIFF", b"SVID", b"\xff\xd8"):
            try:
                rec = _decode_one(prefix + data)
                assert "error" in rec
            except (ValueError, NotImplementedError, _struct.error,
                    IndexError):
                pass  # decode_media converts these to the error column
