"""PDF encryption tests: cipher known-answer vectors + end-to-end."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_doc_model, expected_text
from scribe_js_spark.operators.pdf.crypto import (
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    aes_cbc_encrypt,
    aes_decrypt,
    rc4,
)
from scribe_js_spark.render_pdf import render_pdf


def test_rc4_known_answer():
    # Classic public RC4 test vector
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"


def test_aes128_fips197_appendix_b():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    plain = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    cipher = bytes.fromhex("3925841d02dc09fbdc118597196a0b32")
    rks = _expand_key(key)
    assert _encrypt_block(plain, rks) == cipher
    assert _decrypt_block(cipher, rks) == plain


def test_aes256_fips197_appendix_c3():
    key = bytes(range(32))
    plain = bytes.fromhex("00112233445566778899aabbccddeeff")
    cipher = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    rks = _expand_key(key)
    assert _encrypt_block(plain, rks) == cipher
    assert _decrypt_block(cipher, rks) == plain


def test_aes_cbc_roundtrip_with_padding():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    msg = b"attack at dawn"
    pad = 16 - len(msg) % 16
    ct = iv + aes_cbc_encrypt(key, iv, msg + bytes([pad]) * pad)
    assert aes_decrypt(key, ct) == msg
    assert aes_decrypt(key, ct, remove_padding=False)[: len(msg)] == msg


def test_aes_decrypt_degenerate_inputs():
    key = bytes(16)
    assert aes_decrypt(key, bytes(16)) == b""          # IV only
    assert aes_decrypt(key, b"short") == b"short"      # not block-sized


def test_encrypted_pdf_all_modes_byte_identical():
    for i, mode in enumerate(("rc4_40", "rc4_128", "aesv2", "aesv3")):
        model = build_doc_model(i)
        res = extract_document(render_pdf(model, encrypt_mode=mode))
        assert res.error is None, (mode, res.error)
        assert res.text == expected_text(model), mode


def test_tampered_v5_user_hash_fails_closed():
    model = build_doc_model(9)
    data = bytearray(render_pdf(model, encrypt_mode="aesv3"))
    at = data.find(b"/U <")
    data[at + 4] = ord("0") if data[at + 4] != ord("0") else ord("1")
    res = extract_document(bytes(data))
    assert res.error is not None
    assert "encrypt" in res.error.lower()
