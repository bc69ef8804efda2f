"""PDF standard security handler (RC4) — decrypt support for pdfx.

Implements the password-based standard security handler of PDF 32000-1
§7.6.3 (public spec) for the RC4 ciphers: V=1 (40-bit) and V=2 (up to
128-bit), revisions R=2 and R=3, with the EMPTY user password — the
overwhelmingly common "encrypted for permissions, readable by anyone"
web PDF.  AES (V≥4) and non-empty passwords stay out of scope: the
reader falls back to the skip-encrypted path (emit nothing, never
ciphertext garbage).

Everything here is stdlib (hashlib.md5 + bytes): no crypto libs exist
in this sandbox, and none are needed — RC4 is ~15 lines, and PDF's key
derivation is just seeded MD5 chains.  Pure-Python RC4 throughput
(~5 MB/s) only ever applies to documents that ARE encrypted, inside
the already-Python Arrow extract stage.

Also provides ``encrypt_pdf_rc4`` — the fixture-side transform that
turns any ``write_pdf`` output into a REAL spec-conformant encrypted
document (per-object RC4 keys, /O //U entries, incremental-update
/Encrypt trailer), so tests can assert decrypt(encrypt(x)) == x instead
of trusting the decoder about itself.
"""

from __future__ import annotations

import hashlib
import re

# PDF 32000-1 §7.6.3.3 Algorithm 2: the 32-byte password pad constant
_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA).  Symmetric: encrypt == decrypt."""
    S = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % kl]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def file_key(o: bytes, p: int, id0: bytes, user_pw: bytes = b"",
             r: int = 2, n: int = 5) -> bytes:
    """Algorithm 2: the file encryption key from the padded user
    password, /O, /P (4-byte little-endian SIGNED), and /ID[0]."""
    h = hashlib.md5()
    h.update(_pad_pw(user_pw))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def owner_entry(owner_pw: bytes, user_pw: bytes, r: int = 2,
                n: int = 5) -> bytes:
    """Algorithm 3: the /O entry (RC4 of the padded user password under
    a key derived from the owner password)."""
    key = hashlib.md5(_pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    out = rc4(key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
    return out


def user_entry(key: bytes, id0: bytes, r: int = 2) -> bytes:
    """Algorithm 4 (R=2) / 5 (R≥3): the /U verification entry."""
    if r == 2:
        return rc4(key, _PAD)
    digest = hashlib.md5(_PAD + id0).digest()
    out = rc4(key, digest)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in key), out)
    return out + b"\x00" * 16  # arbitrary 16-byte padding per spec


def verify_user_pw(u: bytes, o: bytes, p: int, id0: bytes,
                   r: int, n: int, user_pw: bytes = b"") -> bytes | None:
    """Algorithm 6: derive the key for ``user_pw`` and check it against
    /U.  Returns the file key on success, None on wrong password."""
    key = file_key(o, p, id0, user_pw, r, n)
    expect = user_entry(key, id0, r)
    ok = (expect[:16] == u[:16]) if r >= 3 else (expect == u[:32])
    return key if ok else None


def obj_key(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: the per-object key — md5(file key + 3 low bytes of
    the object number + 2 low bytes of the generation), truncated to
    min(len(key)+5, 16)."""
    h = hashlib.md5(
        key + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
    ).digest()
    return h[:min(len(key) + 5, 16)]


# ---------------------------------------------------------------------------
# fixture-side encryptor
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"(stream\r?\n)(.*?)(\r?\nendstream)", re.DOTALL)
_OBJ_SPAN_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b.*?\bendobj", re.DOTALL)
_LIT_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)", re.DOTALL)

_UNESC = {ord("\\"): b"\\", ord("("): b"(", ord(")"): b")",
          ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t"}


def _unescape_bytes(s: bytes) -> bytes:
    """Bytes-level PDF literal-string unescape (mirror of pdfx
    ``_unescape``, without the latin-1 round trip)."""
    if b"\\" not in s:
        return s
    out, i, n = bytearray(), 0, len(s)
    while i < n:
        c = s[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = s[i + 1]
            if nxt in _UNESC:
                out += _UNESC[nxt]
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and 0x30 <= s[j] <= 0x37:
                    j += 1
                out.append(int(s[i + 1:j], 8))
                i = j
                continue
            i += 2  # lone escape: keep the escaped byte verbatim
            out.append(nxt)
            continue
        out.append(c)
        i += 1
    return bytes(out)


def _escape_bytes(s: bytes) -> bytes:
    """Escape arbitrary (ciphertext) bytes into a PDF literal string
    body: backslash, parens, CR and LF — everything else rides raw."""
    out = bytearray()
    esc = {0x5C: b"\\\\", 0x28: b"\\(", 0x29: b"\\)",
           0x0D: b"\\r", 0x0A: b"\\n"}
    for b in s:
        out += esc.get(b, bytes([b]))
    return bytes(out)


def encrypt_pdf_rc4(raw: bytes, user_pw: bytes = b"",
                    owner_pw: bytes = b"owner", r: int = 2,
                    keybits: int = 40) -> bytes:
    """Re-serialize a classic-xref PDF as a REAL spec-conformant
    RC4-encrypted document: every stream body AND every dict literal
    string is re-encrypted under its per-object key (Algorithm 1), the
    /Encrypt dictionary is appended as a new object, and a fresh
    classic xref + trailer (carrying /Encrypt and /ID) is emitted —
    string ciphertext needs re-escaping, which shifts offsets, so the
    xref is rebuilt rather than patched.  ``r``/``keybits``: (2, 40) →
    V=1; (3, 40..128) → V=2.  The /Encrypt dict's own /O //U strings
    are hex and (per spec) never themselves encrypted."""
    n = keybits // 8
    v = 1 if (r == 2 and keybits == 40) else 2
    p = -64  # permissions bits; opaque to extraction
    id0 = hashlib.md5(raw).digest()
    o = owner_entry(owner_pw, user_pw, r, n)
    key = file_key(o, p, id0, user_pw, r, n)
    u = user_entry(key, id0, r)

    root = re.search(rb"/Root\s+(\d+)\s+(\d+)\s+R", raw)
    root_ref = (root.group(0) if root else b"/Root 1 0 R").decode("latin-1")

    objs: list[tuple[int, bytes]] = []
    for om in _OBJ_SPAN_RE.finditer(raw):
        num, gen = int(om.group(1)), int(om.group(2))
        seg = om.group(0)
        ok = obj_key(key, num, gen)
        sm = _STREAM_RE.search(seg)
        head = seg[:sm.start()] if sm else seg

        def _enc_lit(m: re.Match, _ok=ok) -> bytes:
            return b"(" + _escape_bytes(
                rc4(_ok, _unescape_bytes(m.group(1)))) + b")"

        head = _LIT_RE.sub(_enc_lit, head)
        if sm:
            body = rc4(ok, seg[sm.start(2):sm.end(2)])
            seg = (head + seg[sm.start():sm.start(2)] + body
                   + seg[sm.end(2):])
        else:
            seg = head
        objs.append((num, seg))

    enum = max(num for num, _ in objs) + 1
    objs.append((enum, (
        f"{enum} 0 obj\n<< /Filter /Standard /V {v} /R {r} "
        f"/Length {keybits} /P {p} /O <{o.hex()}> /U <{u[:32].hex()}> >>"
        f"\nendobj").encode("latin-1")))

    out = bytearray(b"%PDF-1.4\n")
    offs: dict[int, int] = {}
    for num, seg in objs:
        offs[num] = len(out)
        out += seg + b"\n"
    xref_off = len(out)
    size = enum + 1
    rows = [b"0000000000 65535 f \n"]
    for i in range(1, size):
        rows.append(f"{offs[i]:010d} 00000 n \n".encode("latin-1")
                    if i in offs else b"0000000000 65535 f \n")
    out += f"xref\n0 {size}\n".encode("latin-1") + b"".join(rows)
    out += (
        f"trailer\n<< /Size {size} {root_ref} /Encrypt {enum} 0 R "
        f"/ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)
