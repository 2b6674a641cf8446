"""PDF standard security handler (encrypted PDFs).

Reimplements /root/reference/js/pdf/pdfCrypto.js: RC4 and AES-CBC
primitives, the standard-handler key derivations, and per-object
decryption:

- V=1/R=2 (RC4 40-bit), V=2/R=3 (RC4 /Length bits), V=4/R=4
  (AESV2 = AES-128-CBC, or RC4 crypt filter): Algorithm 2 base key
  (padded password + /O + P + /ID [+ ffffffff when metadata is
  unencrypted], MD5, 50 extra rounds for R>=3) and the per-object MD5
  key (obj/gen bytes [+ 'sAlT' for AES]) (:778-841).
- V=5/R=5 (single SHA-256) and V=5/R=6 (Algorithm 2.B iterative
  SHA-256/384/512 + AES-CBC rounds): validate the empty user/owner
  password against /U//O and unwrap the file key from /UE//OE
  (:655-760).

MD5/SHA come from hashlib (the reference hand-rolls them only because
browser JS lacks synchronous digests); RC4 and AES are implemented
here (no third-party crypto dependency). An unsupported handler or a
failed (non-empty) password raises PdfError('encrypted...') so the
document surfaces as a parse failure instead of emitting garbage.
"""

from __future__ import annotations

import hashlib

# ------------------------------------------------------------------ RC4


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------------------ AES

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16")
_INV_SBOX = bytes(256)
_inv = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _inv[_v] = _i
_INV_SBOX = bytes(_inv)
_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xt(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else (a << 1)


def _mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _xt(a)
        b >>= 1
    return r


def _expand_key(key: bytes) -> list[bytes]:
    """FIPS-197 forward key schedule -> list of 16-byte round keys."""
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [bytes(sum(w[4 * r:4 * r + 4], []))
            for r in range(nr + 1)]


def _add_rk(state: bytearray, rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


_SHIFT = (0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11)
_INV_SHIFT = (0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3)


def _encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    state = bytearray(block)
    _add_rk(state, rks[0])
    for r in range(1, len(rks) - 1):
        state = bytearray(_SBOX[state[_SHIFT[i]]] for i in range(16))
        ns = bytearray(16)
        for c in range(4):
            a = state[4 * c:4 * c + 4]
            ns[4 * c] = _xt(a[0]) ^ _xt(a[1]) ^ a[1] ^ a[2] ^ a[3]
            ns[4 * c + 1] = a[0] ^ _xt(a[1]) ^ _xt(a[2]) ^ a[2] ^ a[3]
            ns[4 * c + 2] = a[0] ^ a[1] ^ _xt(a[2]) ^ _xt(a[3]) ^ a[3]
            ns[4 * c + 3] = _xt(a[0]) ^ a[0] ^ a[1] ^ a[2] ^ _xt(a[3])
        state = ns
        _add_rk(state, rks[r])
    state = bytearray(_SBOX[state[_SHIFT[i]]] for i in range(16))
    _add_rk(state, rks[-1])
    return bytes(state)


def _decrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    state = bytearray(block)
    _add_rk(state, rks[-1])
    for r in range(len(rks) - 2, 0, -1):
        state = bytearray(_INV_SBOX[state[_INV_SHIFT[i]]]
                          for i in range(16))
        _add_rk(state, rks[r])
        ns = bytearray(16)
        for c in range(4):
            a = state[4 * c:4 * c + 4]
            ns[4 * c] = (_mul(a[0], 14) ^ _mul(a[1], 11)
                         ^ _mul(a[2], 13) ^ _mul(a[3], 9))
            ns[4 * c + 1] = (_mul(a[0], 9) ^ _mul(a[1], 14)
                             ^ _mul(a[2], 11) ^ _mul(a[3], 13))
            ns[4 * c + 2] = (_mul(a[0], 13) ^ _mul(a[1], 9)
                             ^ _mul(a[2], 14) ^ _mul(a[3], 11))
            ns[4 * c + 3] = (_mul(a[0], 11) ^ _mul(a[1], 13)
                             ^ _mul(a[2], 9) ^ _mul(a[3], 14))
        state = ns
    state = bytearray(_INV_SBOX[state[_INV_SHIFT[i]]] for i in range(16))
    _add_rk(state, rks[0])
    return bytes(state)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt, no padding (data must be a multiple of 16) — used
    by the R=6 hash and the fixture writer."""
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[off:off + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def aes_decrypt(key: bytes, data: bytes, remove_padding: bool = True) -> bytes:
    """AES-CBC decrypt; the first 16 bytes of ``data`` are the IV
    (pdfCrypto.js aesDecrypt semantics, including the degenerate-length
    passthroughs)."""
    if len(data) == 16:
        return b""
    if len(data) < 32 or len(data) % 16 != 0:
        return data
    rks = _expand_key(key)
    out = bytearray()
    prev = data[:16]
    for off in range(16, len(data), 16):
        blk = data[off:off + 16]
        plain = _decrypt_block(blk, rks)
        out += bytes(a ^ b for a, b in zip(plain, prev))
        prev = blk
    if remove_padding and out:
        pad = out[-1]
        if 0 < pad <= 16:
            return bytes(out[:-pad])
    return bytes(out)


# --------------------------------------------------- key derivation

PASSWORD_PADDING = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def compute_encryption_key(password: bytes, o_value: bytes, p: int,
                           doc_id: bytes, key_length: int, r: int,
                           encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2 (pdfCrypto.js computeEncryptionKey)."""
    padded = (password + PASSWORD_PADDING)[:32]
    p_bytes = (p & 0xFFFFFFFF).to_bytes(4, "little")
    data = padded + bytes(o_value[:32]) + p_bytes + bytes(doc_id)
    if r >= 4 and not encrypt_metadata:
        data += b"\xff\xff\xff\xff"
    h = hashlib.md5(data).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:key_length]).digest()
    return h[:key_length]


def compute_object_key(base_key: bytes, obj_num: int, gen_num: int,
                       use_aes: bool = False) -> bytes:
    """Per-object key (pdfCrypto.js computeObjectKey)."""
    data = (base_key
            + bytes([obj_num & 0xFF, (obj_num >> 8) & 0xFF,
                     (obj_num >> 16) & 0xFF,
                     gen_num & 0xFF, (gen_num >> 8) & 0xFF]))
    if use_aes:
        data += b"sAlT"
    h = hashlib.md5(data).digest()
    return h[:min(len(base_key) + 5, 16)]


def hash_r6(password: bytes, salt: bytes, user_key: bytes) -> bytes:
    """Algorithm 2.B iterative hash (pdfCrypto.js computeHashR6)."""
    k = hashlib.sha256(password + salt + user_key).digest()
    round_n = 0
    while True:
        round_n += 1
        one = password + k + user_key
        k1 = one * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        rem = sum(e[:16]) % 3
        if rem == 0:
            k = hashlib.sha256(e).digest()
        elif rem == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        if round_n >= 64 and e[-1] <= round_n - 32:
            break
    return k[:32]


def _derive_file_key_v5(u, ue, o, oe, r: int):
    """R=5 (single SHA-256) / R=6 (hash_r6) file-key unwrap with the
    empty password, user slot first then owner slot."""
    password = b""

    def _hash(salt, user_key):
        if r == 5:
            return hashlib.sha256(password + salt + user_key).digest()
        return hash_r6(password, salt, user_key)

    if _hash(u[32:40], b"") == bytes(u[:32]):
        inter = _hash(u[40:48], b"")
        return aes_decrypt(inter, b"\x00" * 16 + bytes(ue), False)
    if o and oe:
        if _hash(o[32:40], bytes(u[:48])) == bytes(o[:32]):
            inter = _hash(o[40:48], bytes(u[:48]))
            return aes_decrypt(inter, b"\x00" * 16 + bytes(oe), False)
    return None


# ------------------------------------------------------------ handler


class PdfCrypto:
    """Decryption state for one document: base key + cipher mode."""

    __slots__ = ("key", "mode", "enc_objnum")

    def __init__(self, key: bytes, mode: str, enc_objnum: int):
        self.key = key
        self.mode = mode  # 'RC4' | 'AESV2' | 'AESV3'
        self.enc_objnum = enc_objnum

    def decrypt(self, data: bytes, obj_num: int, gen_num: int = 0) -> bytes:
        if obj_num == self.enc_objnum:
            return data
        if self.mode == "AESV3":
            return aes_decrypt(self.key, data)
        if self.mode == "AESV2":
            return aes_decrypt(
                compute_object_key(self.key, obj_num, gen_num, True), data)
        return rc4(
            compute_object_key(self.key, obj_num, gen_num, False), data)


def setup_encryption(doc) -> PdfCrypto | None:
    """Build the document decryptor from the trailer /Encrypt dict
    (pdfCrypto.js setupEncryption, simplified by our parsed object
    model: the trailer dict and /ID array are already materialized).
    Raises PdfError for unsupported handlers or failed validation."""
    from .document import PdfError
    from .lexer import Ref

    enc_ref = doc.trailer.get("Encrypt")
    if enc_ref is None:
        return None
    enc_objnum = enc_ref.num if isinstance(enc_ref, Ref) else -1
    enc = doc.resolve(enc_ref)
    if not isinstance(enc, dict):
        raise PdfError("encrypted: unreadable /Encrypt dict")
    if str(doc.resolve(enc.get("Filter", ""))) != "Standard":
        raise PdfError("encrypted: unsupported security handler")
    v = int(doc.resolve(enc.get("V", -1)) or -1)
    r = int(doc.resolve(enc.get("R", -1)) or -1)
    p = int(doc.resolve(enc.get("P", 0)) or 0)
    if v not in (1, 2, 4, 5):
        raise PdfError(f"encrypted: unsupported V={v}")

    if v == 5:
        u = doc.resolve(enc.get("U"))
        ue = doc.resolve(enc.get("UE"))
        o = doc.resolve(enc.get("O"))
        oe = doc.resolve(enc.get("OE"))
        if not u or not ue or len(u) < 48 or len(ue) < 32:
            raise PdfError("encrypted: V=5 missing /U or /UE")
        key = _derive_file_key_v5(
            bytes(u), bytes(ue)[:32],
            bytes(o) if o and len(o) >= 48 else None,
            bytes(oe)[:32] if oe and len(oe) >= 32 else None, r)
        if key is None:
            raise PdfError("encrypted: password required")
        return PdfCrypto(key, "AESV3", enc_objnum)

    key_length = 5
    if v == 4:
        key_length = 16
    elif v == 2:
        key_length = int(doc.resolve(enc.get("Length", 40)) or 40) // 8

    mode = "RC4"
    if v == 4:
        stmf = str(doc.resolve(enc.get("StmF", "Identity")) or "Identity")
        if stmf == "Identity":
            return None  # streams not encrypted
        cf = doc.resolve(enc.get("CF")) or {}
        filt = doc.resolve(cf.get(stmf)) or {}
        cfm = str(doc.resolve(filt.get("CFM", "")))
        mode = "AESV2" if cfm == "AESV2" else "RC4"

    encrypt_metadata = doc.resolve(enc.get("EncryptMetadata", True))
    encrypt_metadata = bool(encrypt_metadata) if encrypt_metadata is not None \
        else True
    o_value = doc.resolve(enc.get("O"))
    if not o_value:
        raise PdfError("encrypted: missing /O")
    doc_id_arr = doc.resolve(doc.trailer.get("ID"))
    if not doc_id_arr:
        raise PdfError("encrypted: missing document /ID")
    doc_id = bytes(doc.resolve(doc_id_arr[0]))

    key = compute_encryption_key(
        b"", bytes(o_value), p, doc_id, key_length, r, encrypt_metadata)
    return PdfCrypto(key, mode, enc_objnum)
