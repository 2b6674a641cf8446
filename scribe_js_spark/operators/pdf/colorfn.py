"""PDF color functions: Separation/DeviceN tint transforms -> RGB.

Mirrors js/pdf/pdfColorFunctions.js: PDF function evaluation (sampled
type 0, exponential type 2, stitching type 3, PostScript calculator
type 4 — tokenizePS/evaluatePS :9-133, evaluateFunction :329),
cmykToRgb polynomial (:611), altCSToRGB (:650) and
parseTintColorSpace/tintComponentsToRGB (:704, :815). Works on the
parsed object graph from document.py instead of the JS object-text
regexes, so structure matching is exact.
"""

from __future__ import annotations

import math
import re

from .lexer import Name, StreamObj


def _jround(x: float) -> int:
    """JS Math.round: half away from floor (not banker's)."""
    return math.floor(x + 0.5)

# -------------------------------------------------- PostScript calculator


def tokenize_ps(code: str) -> list:
    """'{ ... }' -> nested token lists (pdfColorFunctions.js:9)."""
    src = code.strip()
    if src.startswith("{") and src.endswith("}"):
        src = src[1:-1]
    tokens: list = []
    stack = [tokens]
    for tok in re.findall(r"\{|\}|[^\s{}]+", src):
        if tok == "{":
            sub: list = []
            stack[-1].append(sub)
            stack.append(sub)
        elif tok == "}":
            stack.pop()
        else:
            try:
                stack[-1].append(float(tok))
            except ValueError:
                stack[-1].append(tok)
    return tokens


def evaluate_ps(tokens: list, inputs: list[float]) -> list:
    """Run a type-4 calculator program (pdfColorFunctions.js:38)."""
    st: list = list(inputs)

    def run(toks):
        for tok in toks:
            if isinstance(tok, (int, float)) or isinstance(tok, list):
                st.append(tok)
                continue
            if tok == "true":
                st.append(True)
                continue
            if tok == "false":
                st.append(False)
                continue
            try:
                _op(tok, run)
            except (IndexError, ValueError, ZeroDivisionError,
                    OverflowError):
                continue

    def _op(tok, run):
        a = st.pop
        if tok == "dup":
            v = a()
            st.extend((v, v))
        elif tok == "exch":
            x, y = a(), a()
            st.extend((x, y))
        elif tok == "pop":
            a()
        elif tok == "copy":
            n = int(a())
            if n > 0:
                st.extend(st[-n:])
        elif tok == "index":
            st.append(st[-1 - int(a())])
        elif tok == "roll":
            j, n = int(a()), int(a())
            if n > 0:
                group = st[-n:]
                del st[-n:]
                shift = j % n
                st.extend(group[-shift:] + group[:-shift] if shift
                          else group)
        elif tok == "add":
            x = a()
            st.append(a() + x)
        elif tok == "sub":
            x = a()
            st.append(a() - x)
        elif tok == "mul":
            x = a()
            st.append(a() * x)
        elif tok == "div":
            x = a()
            st.append(a() / x)
        elif tok == "idiv":
            x = a()
            st.append(math.trunc(a() / x))
        elif tok == "mod":
            x = a()
            st.append(math.fmod(a(), x))
        elif tok == "neg":
            st.append(-a())
        elif tok == "abs":
            st.append(abs(a()))
        elif tok == "ceiling":
            st.append(math.ceil(a()))
        elif tok == "floor":
            st.append(math.floor(a()))
        elif tok == "round":
            # JS Math.round: half away from floor
            st.append(math.floor(a() + 0.5))
        elif tok in ("truncate", "cvi"):
            st.append(math.trunc(a()))
        elif tok == "sqrt":
            st.append(math.sqrt(a()))
        elif tok == "exp":
            x = a()
            st.append(a() ** x)
        elif tok == "ln":
            st.append(math.log(a()))
        elif tok == "log":
            st.append(math.log10(a()))
        elif tok == "sin":
            st.append(math.sin(a() * math.pi / 180))
        elif tok == "cos":
            st.append(math.cos(a() * math.pi / 180))
        elif tok == "atan":
            den, num = a(), a()
            ang = math.atan2(num, den) * 180 / math.pi
            st.append(ang + 360 if ang < 0 else ang)
        elif tok == "eq":
            x = a()
            st.append(a() == x)
        elif tok == "ne":
            x = a()
            st.append(a() != x)
        elif tok == "gt":
            x = a()
            st.append(a() > x)
        elif tok == "ge":
            x = a()
            st.append(a() >= x)
        elif tok == "lt":
            x = a()
            st.append(a() < x)
        elif tok == "le":
            x = a()
            st.append(a() <= x)
        elif tok in ("and", "or", "xor"):
            x, y = a(), a()
            if isinstance(x, bool) and isinstance(y, bool):
                st.append({"and": x and y, "or": x or y,
                           "xor": x != y}[tok])
            else:
                xi, yi = int(x), int(y)
                st.append({"and": xi & yi, "or": xi | yi,
                           "xor": xi ^ yi}[tok])
        elif tok == "not":
            x = a()
            st.append((not x) if isinstance(x, bool) else ~int(x))
        elif tok == "bitshift":
            shift, val = int(a()), int(a())
            st.append(val << shift if shift >= 0 else val >> -shift)
        elif tok == "if":
            proc, cond = a(), a()
            if cond:
                run(proc)
        elif tok == "ifelse":
            fproc, tproc, cond = a(), a(), a()
            run(tproc if cond else fproc)
        elif tok == "cvr":
            pass

    run(tokens)
    return st


# --------------------------------------------------------- PDF functions


def parse_function(doc, obj) -> dict | None:
    """Parsed-function record for evaluate_function
    (pdfColorFunctions.js:134 parseFunction)."""
    obj = doc.resolve(obj)
    d = obj.dict if isinstance(obj, StreamObj) else obj
    if not isinstance(d, dict):
        return None
    try:
        ftype = int(doc.resolve(d.get("FunctionType", -1)))
    except (TypeError, ValueError):
        return None
    domain = [float(v) for v in (doc.resolve(d.get("Domain")) or [0, 1])]
    rng = doc.resolve(d.get("Range"))
    rng = [float(v) for v in rng] if isinstance(rng, list) else None
    fn = {"type": ftype, "domain": domain, "range": rng,
          "n_inputs": len(domain) // 2,
          "n_outputs": len(rng) // 2 if rng else 0}
    if ftype == 2:
        fn["c0"] = [float(v) for v in (doc.resolve(d.get("C0")) or [0.0])]
        fn["c1"] = [float(v) for v in (doc.resolve(d.get("C1")) or [1.0])]
        fn["N"] = float(doc.resolve(d.get("N", 1)))
        fn["n_outputs"] = fn["n_outputs"] or len(fn["c0"])
    elif ftype == 3:
        subs = [parse_function(doc, f)
                for f in (doc.resolve(d.get("Functions")) or [])]
        fn["functions"] = subs
        fn["bounds"] = [float(v)
                        for v in (doc.resolve(d.get("Bounds")) or [])]
        enc = doc.resolve(d.get("Encode"))
        fn["encode"] = ([float(v) for v in enc] if isinstance(enc, list)
                        else [v for _ in subs for v in (0.0, 1.0)])
        fn["n_outputs"] = fn["n_outputs"] or (
            subs[0]["n_outputs"] if subs and subs[0] else 0)
    elif ftype == 0:
        if not isinstance(obj, StreamObj) or not rng:
            return None
        fn["size"] = [int(v) for v in (doc.resolve(d.get("Size")) or [2])]
        fn["bps"] = int(doc.resolve(d.get("BitsPerSample", 8)))
        enc = doc.resolve(d.get("Encode"))
        fn["encode"] = ([float(v) for v in enc]
                        if isinstance(enc, list) else None)
        dec = doc.resolve(d.get("Decode"))
        fn["decode"] = ([float(v) for v in dec]
                        if isinstance(dec, list) else None)
        try:
            fn["samples"] = doc.stream_data(obj)
        except Exception:
            return None
    elif ftype == 4:
        if not isinstance(obj, StreamObj):
            return None
        try:
            fn["tokens"] = tokenize_ps(
                doc.stream_data(obj).decode("latin-1", "replace"))
        except Exception:
            return None
    else:
        return None
    return fn


def _read_sample(samples: bytes, index: int, bps: int) -> int:
    bit = index * bps
    byte = bit >> 3
    if bps == 8:
        return samples[byte] if byte < len(samples) else 0
    if bps == 16:
        if byte + 1 >= len(samples):
            return 0
        return (samples[byte] << 8) | samples[byte + 1]
    # 1/2/4-bit packing (big-endian within the byte)
    if byte >= len(samples):
        return 0
    shift = 8 - (bit & 7) - bps
    return (samples[byte] >> max(shift, 0)) & ((1 << bps) - 1)


def _eval_sampled(fn: dict, inputs: list[float]) -> list[float]:
    domain, size, bps = fn["domain"], fn["size"], fn["bps"]
    n, n_out = fn["n_inputs"], fn["n_outputs"]
    samples, encode, decode = fn["samples"], fn["encode"], fn["decode"]
    max_sample = (1 << bps) - 1
    e = []
    for i in range(n):
        d_min, d_max = domain[i * 2], domain[i * 2 + 1]
        e_min = encode[i * 2] if encode else 0.0
        e_max = encode[i * 2 + 1] if encode else size[i] - 1
        span = (d_max - d_min) or 1.0
        val = (inputs[i] - d_min) / span * (e_max - e_min) + e_min
        e.append(min(max(val, 0.0), size[i] - 1))
    lo = [math.floor(v) for v in e]
    hi = [min(v + 1, size[i] - 1) for i, v in enumerate(lo)]
    frac = [e[i] - lo[i] for i in range(n)]
    out = [0.0] * n_out
    for c in range(1 << n):
        weight = 1.0
        linear = 0
        stride = 1
        for i in range(n):
            use_hi = (c >> i) & 1
            idx = hi[i] if use_hi else lo[i]
            weight *= frac[i] if use_hi else (1 - frac[i])
            linear += idx * stride
            stride *= size[i]
        for oi in range(n_out):
            out[oi] += weight * _read_sample(
                samples, linear * n_out + oi, bps)
    for oi in range(n_out):
        if decode:
            d_min, d_max = decode[oi * 2], decode[oi * 2 + 1]
            out[oi] = out[oi] / max_sample * (d_max - d_min) + d_min
        else:
            out[oi] /= max_sample
    return out


def evaluate_function(fn: dict | None, inputs: list[float]) -> list | None:
    """pdfColorFunctions.js:329 evaluateFunction, all four types."""
    if not fn:
        return None
    clipped = []
    for i in range(fn["n_inputs"]):
        v = inputs[i] if i < len(inputs) and inputs[i] is not None else 0.0
        clipped.append(min(max(v, fn["domain"][i * 2]),
                           fn["domain"][i * 2 + 1]))
    if fn["type"] == 0:
        out = _eval_sampled(fn, clipped)
    elif fn["type"] == 2:
        t = clipped[0]
        t_n = t if fn["N"] == 1 else t ** fn["N"]
        out = [v + t_n * (fn["c1"][j] - v)
               for j, v in enumerate(fn["c0"])]
    elif fn["type"] == 3:
        x = clipped[0]
        bounds = fn["bounds"]
        k = 0
        while k < len(bounds) and x >= bounds[k]:
            k += 1
        sub = fn["functions"][k] if k < len(fn["functions"]) else None
        if sub is None:
            return None
        lower = fn["domain"][0] if k == 0 else bounds[k - 1]
        upper = fn["domain"][1] if k == len(bounds) else bounds[k]
        e_min, e_max = fn["encode"][k * 2], fn["encode"][k * 2 + 1]
        t = (e_min if upper == lower
             else e_min + (x - lower) * (e_max - e_min) / (upper - lower))
        out = evaluate_function(sub, [t])
    elif fn["type"] == 4:
        result = evaluate_ps(fn["tokens"], clipped)
        out = (result[-fn["n_outputs"]:] if fn["n_outputs"] > 0
               else result)
        out = [float(v) for v in out if isinstance(v, (int, float))]
    else:
        return None
    if out is not None and fn["range"]:
        for oi in range(min(len(out), len(fn["range"]) // 2)):
            out[oi] = min(max(out[oi], fn["range"][oi * 2]),
                          fn["range"][oi * 2 + 1])
    return out


# ------------------------------------------------------- color conversion


def cmyk_to_rgb(c: float, m: float, y: float, k: float) -> list[int]:
    """Adobe-calibrated CMYK->RGB polynomial
    (pdfColorFunctions.js:611), 0..255 byte outputs."""
    if c == 0 and m == 0 and y == 0:
        gray = max(0, min(255, _jround(255 * (1 - k))))
        return [gray, gray, gray]
    if c == 1 and m == 1 and y == 1 and k == 1:
        return [0, 0, 0]
    r = 255 \
        + c * (-4.387332384609988 * c + 54.48615194189176 * m
               + 18.82290502165302 * y + 212.25662451639585 * k
               - 285.2331026137004) \
        + m * (1.7149763477362134 * m - 5.6096736904047315 * y
               - 17.873870861415444 * k - 5.497006427196366) \
        + y * (-2.5217340131683033 * y - 21.248923337353073 * k
               + 17.5119270841813) \
        + k * (-21.86122147463605 * k - 189.48180835922747)
    g = 255 \
        + c * (8.841041422036149 * c + 60.118027045597366 * m
               + 6.871425592049007 * y + 31.159100130055922 * k
               - 79.2970844816548) \
        + m * (-15.310361306967817 * m + 17.575251261109482 * y
               + 131.35250912493976 * k - 190.9453302588951) \
        + y * (4.444339102852739 * y + 9.8632861493405 * k
               - 24.86741582555878) \
        + k * (-20.737325471181034 * k - 187.80453709719578)
    b = 255 \
        + c * (0.8842522430003296 * c + 8.078677503112928 * m
               + 30.89978309703729 * y - 0.23883238689178934 * k
               - 14.183576799673286) \
        + m * (10.49593273432072 * m + 63.02378494754052 * y
               + 50.606957656360734 * k - 112.23884253719248) \
        + y * (0.03296041114873217 * y + 115.60384449646641 * k
               - 193.58209356861505) \
        + k * (-22.33816807309886 * k - 180.12613974708367)
    return [max(0, min(255, _jround(r))), max(0, min(255, _jround(g))),
            max(0, min(255, _jround(b)))]


def _alt_to_rgb(alt_name: str, comp: list[float]) -> list[int]:
    """altCSToRGB for the alternate spaces our fixtures and real PDFs
    use (pdfColorFunctions.js:650; CalRGB/CalGray fold to their device
    analogues, ICCBased to component count)."""
    def at(i):
        return comp[i] if i < len(comp) else 0.0

    if alt_name == "DeviceCMYK" or (alt_name == "ICC" and len(comp) == 4):
        return cmyk_to_rgb(at(0), at(1), at(2), at(3))
    if alt_name in ("DeviceGray", "CalGray") or len(comp) == 1:
        gray = _jround(255 * min(max(at(0), 0.0), 1.0))
        return [gray, gray, gray]
    if alt_name == "Lab":
        # neutral-luminance fold (color_to_rgb's Lab approximation)
        lum = min(max(at(0) / 100.0, 0.0), 1.0)
        gray = _jround(255 * lum)
        return [gray, gray, gray]
    return [max(0, min(255, _jround(255 * at(i)))) for i in range(3)]


def parse_tint_colorspace(doc, cs_obj) -> dict | None:
    """[/Separation name alt tint] or [/DeviceN names alt tint] ->
    {n_inputs, fn, alt} (pdfColorFunctions.js:704). Returns None for
    device/simple spaces (sc components then read raw)."""
    cs = doc.resolve(cs_obj)
    if not isinstance(cs, list) or not cs:
        return None
    kind = str(doc.resolve(cs[0]))
    if kind == "Separation" and len(cs) >= 4:
        names, alt_obj, fn_obj = 1, cs[2], cs[3]
    elif kind == "DeviceN" and len(cs) >= 4:
        name_list = doc.resolve(cs[1])
        names = len(name_list) if isinstance(name_list, list) else 1
        alt_obj, fn_obj = cs[2], cs[3]
    else:
        return None
    alt = doc.resolve(alt_obj)
    if isinstance(alt, list) and alt:
        alt_kind = str(doc.resolve(alt[0]))
        if alt_kind == "ICCBased":
            stream = doc.resolve(alt[1]) if len(alt) > 1 else None
            ncomp = 3
            if isinstance(stream, StreamObj):
                try:
                    ncomp = int(doc.resolve(stream.dict.get("N", 3)))
                except (TypeError, ValueError):
                    ncomp = 3
            alt_name = {1: "DeviceGray", 4: "DeviceCMYK"}.get(
                ncomp, "DeviceRGB")
        else:
            alt_name = alt_kind
    elif isinstance(alt, (Name, str)):
        alt_name = str(alt)
    else:
        alt_name = "DeviceRGB"
    fn = parse_function(doc, fn_obj)
    return {"n_inputs": names, "fn": fn, "alt": alt_name}


def tint_to_rgb(tint: dict, comps: list[float]) -> list[float] | None:
    """Tint components -> [r,g,b] in 0..1
    (pdfColorFunctions.js:815 tintComponentsToRGB)."""
    out = evaluate_function(tint.get("fn"), comps)
    if out is None:
        return None
    rgb = _alt_to_rgb(tint["alt"], out)
    return [rgb[0] / 255.0, rgb[1] / 255.0, rgb[2] / 255.0]


_hex_memo: dict = {}


def rgb_to_hex(rgb: list[float]) -> str:
    """[r,g,b] 0..1 -> '#rrggbb' (parsePdfDoc.js:63 rgbToHex).

    Memoized by component tuple — a page reuses a handful of text
    colors but this runs once per word (hot in the grouping profile);
    bounded so adversarial corpora cannot grow executor memory."""
    key = (rgb[0], rgb[1], rgb[2])
    v = _hex_memo.get(key)
    if v is None:
        if len(_hex_memo) > 4096:
            _hex_memo.clear()
        def h(x):
            return format(max(0, min(255, _jround(x * 255))), "02x")
        v = _hex_memo[key] = f"#{h(rgb[0])}{h(rgb[1])}{h(rgb[2])}"
    return v
