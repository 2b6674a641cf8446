"""PDF object lexer/parser.

Tokenizes PDF syntax (numbers, names, strings, hex strings, arrays,
dictionaries, indirect references, streams) per PDF 1.7 §7.3. Fresh
implementation; operator coverage mirrors the reference's tokenizer
(/root/reference/js/pdf/contentStream.js:47-373).
"""

from __future__ import annotations

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMS = b"()<>[]{}/%"


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):  # pragma: no cover
        return f"{self.num} {self.gen} R"

    def __eq__(self, other):
        return isinstance(other, Ref) and self.num == other.num and self.gen == other.gen

    def __hash__(self):
        return hash((self.num, self.gen))


class Name(str):
    """PDF name object (distinct from string literals)."""
    __slots__ = ()


class Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    # -------------------------------------------------------- low level

    def skip_ws(self) -> None:
        data, n = self.data, len(self.data)
        pos = self.pos
        while pos < n:
            c = data[pos]
            if c in WHITESPACE:
                pos += 1
            elif c == 0x25:  # '%' comment
                while pos < n and data[pos] not in b"\r\n":
                    pos += 1
            else:
                break
        self.pos = pos

    def peek_byte(self) -> int:
        return self.data[self.pos] if self.pos < len(self.data) else -1

    def read_token_word(self) -> bytes:
        """Read a regular token (keyword / number)."""
        data, n = self.data, len(self.data)
        start = self.pos
        pos = start
        while pos < n and data[pos] not in WHITESPACE and data[pos] not in DELIMS:
            pos += 1
        self.pos = pos
        return data[start:pos]

    # ------------------------------------------------------ object read

    def read_object(self):
        self.skip_ws()
        c = self.peek_byte()
        if c == -1:
            raise ValueError("unexpected EOF in PDF object")
        data = self.data

        if c == 0x2F:  # '/'
            return self.read_name()
        if c == 0x28:  # '('
            return self.read_literal_string()
        if c == 0x3C:  # '<'
            if data[self.pos : self.pos + 2] == b"<<":
                return self.read_dict_or_stream()
            return self.read_hex_string()
        if c == 0x5B:  # '['
            self.pos += 1
            arr = []
            while True:
                self.skip_ws()
                if self.peek_byte() == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.read_object())
        if c == 0x5D:
            raise ValueError("unexpected ]")

        tok = self.read_token_word()
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        # number or indirect reference
        try:
            if b"." in tok:
                return float(tok)
            num = int(tok)
        except ValueError:
            raise ValueError(f"bad token {tok!r} at {self.pos}")
        # lookahead for "gen R"
        save = self.pos
        self.skip_ws()
        tok2_start = self.pos
        tok2 = self.read_token_word()
        if tok2.isdigit():
            self.skip_ws()
            tok3 = self.read_token_word()
            if tok3 == b"R":
                return Ref(num, int(tok2))
        self.pos = save
        return num

    def read_name(self) -> Name:
        assert self.data[self.pos] == 0x2F
        self.pos += 1
        data, n = self.data, len(self.data)
        out = bytearray()
        pos = self.pos
        while pos < n:
            c = data[pos]
            if c in WHITESPACE or c in DELIMS:
                break
            if c == 0x23 and pos + 2 < n:  # '#xx' escape
                try:
                    out.append(int(data[pos + 1 : pos + 3], 16))
                    pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            pos += 1
        self.pos = pos
        return Name(out.decode("latin-1"))

    def read_literal_string(self) -> bytes:
        assert self.data[self.pos] == 0x28
        self.pos += 1
        data, n = self.data, len(self.data)
        out = bytearray()
        depth = 1
        pos = self.pos
        while pos < n:
            c = data[pos]
            if c == 0x5C:  # backslash
                pos += 1
                if pos >= n:
                    break
                e = data[pos]
                if e == 0x6E:
                    out.append(0x0A)
                elif e == 0x72:
                    out.append(0x0D)
                elif e == 0x74:
                    out.append(0x09)
                elif e == 0x62:
                    out.append(0x08)
                elif e == 0x66:
                    out.append(0x0C)
                elif e in b"()\\":
                    out.append(e)
                elif 0x30 <= e <= 0x37:  # octal
                    oct_digits = [e - 0x30]
                    for _ in range(2):
                        if pos + 1 < n and 0x30 <= data[pos + 1] <= 0x37:
                            pos += 1
                            oct_digits.append(data[pos] - 0x30)
                        else:
                            break
                    val = 0
                    for d in oct_digits:
                        val = val * 8 + d
                    out.append(val & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and pos + 1 < n and data[pos + 1] == 0x0A:
                        pos += 1
                else:
                    out.append(e)
                pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    pos += 1
                    break
            out.append(c)
            pos += 1
        self.pos = pos
        return bytes(out)

    def read_hex_string(self) -> bytes:
        assert self.data[self.pos] == 0x3C
        self.pos += 1
        data, n = self.data, len(self.data)
        digits = bytearray()
        pos = self.pos
        while pos < n and data[pos] != 0x3E:
            c = data[pos]
            if c not in WHITESPACE:
                digits.append(c)
            pos += 1
        self.pos = pos + 1
        if len(digits) % 2:
            digits.append(0x30)
        try:
            return bytes.fromhex(digits.decode("latin-1"))
        except ValueError:
            return b""

    def read_dict_or_stream(self):
        d = self.read_dict()
        save = self.pos
        self.skip_ws()
        tok = self.read_token_word()
        if tok == b"stream":
            # EOL after 'stream': CRLF or LF
            if self.data[self.pos : self.pos + 2] == b"\r\n":
                self.pos += 2
            elif self.data[self.pos : self.pos + 1] in (b"\n", b"\r"):
                self.pos += 1
            return StreamObj(d, self.pos)
        self.pos = save
        return d

    def read_dict(self) -> dict:
        assert self.data[self.pos : self.pos + 2] == b"<<"
        self.pos += 2
        d = {}
        while True:
            self.skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return d
            key = self.read_object()
            if not isinstance(key, Name):
                raise ValueError(f"dict key not a name: {key!r}")
            d[str(key)] = self.read_object()


class StreamObj:
    """A stream whose raw bytes start at ``data_pos`` (length resolved
    lazily against the xref, since /Length may be an indirect ref)."""

    __slots__ = ("dict", "data_pos", "objnum", "gen")

    def __init__(self, d: dict, data_pos: int):
        self.dict = d
        self.data_pos = data_pos
        self.objnum = None  # set by PdfDocument.get_object (decryption)
        self.gen = 0
