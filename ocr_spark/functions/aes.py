"""Pure-stdlib AES-128/192/256 + CBC for the PDF security handlers.

FIPS-197 block cipher, both directions (the PDF 2.0 R6 key-derivation
hash, ISO 32000-2 Algorithm 2.B, needs the ENCRYPT direction even when
only reading).  No crypto libraries exist in this sandbox; tables are
generated from GF(2^8) arithmetic at import instead of transcribed, and
``tests/test_extract_semantics.py`` pins the FIPS-197 Appendix C known
answers.

Throughput is the pure-Python ballpark (~1 MB/s): it only ever runs on
documents that ARE AES-encrypted, inside the already-Python Arrow
extract batch.  At real 100 TB scale the swap-in is any native AES
(``cryptography``, OpenSSL via ctypes) behind these two functions.
"""

from __future__ import annotations

# -- GF(2^8) tables (generator 3), S-boxes ----------------------------------
_EXP = [0] * 512
_LOG = [0] * 256
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x ^= ((_x << 1) ^ (0x1B if _x & 0x80 else 0)) & 0x1FF
    _x &= 0xFF
for _i in range(255, 512):
    _EXP[_i] = _EXP[_i - 255]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _rotl8(b: int, n: int) -> int:
    return ((b << n) | (b >> (8 - n))) & 0xFF


_SBOX = bytearray(256)
for _i in range(256):
    _inv = _EXP[255 - _LOG[_i]] if _i else 0
    _SBOX[_i] = (_inv ^ _rotl8(_inv, 1) ^ _rotl8(_inv, 2)
                 ^ _rotl8(_inv, 3) ^ _rotl8(_inv, 4) ^ 0x63)
_SBOX = bytes(_SBOX)
_INV_SBOX = bytearray(256)
for _i, _s in enumerate(_SBOX):
    _INV_SBOX[_s] = _i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = [1]
while len(_RCON) < 14:
    _RCON.append(_gmul(_RCON[-1], 2))

# per-byte multiply tables for the (inv)MixColumns constants
_M2 = bytes(_gmul(i, 2) for i in range(256))
_M3 = bytes(_gmul(i, 3) for i in range(256))
_M9 = bytes(_gmul(i, 9) for i in range(256))
_M11 = bytes(_gmul(i, 11) for i in range(256))
_M13 = bytes(_gmul(i, 13) for i in range(256))
_M14 = bytes(_gmul(i, 14) for i in range(256))


def _expand_key(key: bytes) -> list[bytes]:
    """Round keys as 16-byte blocks (11/13/15 for 128/192/256)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16/24/32 bytes")
    rounds = nk + 6
    words = [key[4 * i:4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes((t[0] ^ _RCON[i // nk - 1],)) + t[1:]
        elif nk == 8 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r:4 * r + 4]) for r in range(rounds + 1)]


# state is a 16-byte list in COLUMN-major order (byte i = row i%4, col i//4),
# i.e. exactly the wire order — ShiftRows indexes below are derived from that
_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(rk: list[bytes], block: bytes) -> bytes:
    s = bytes(a ^ b for a, b in zip(block, rk[0]))
    for rnd in range(1, len(rk) - 1):
        s = bytes(_SBOX[s[_SHIFT[i]]] for i in range(16))
        o = bytearray(16)
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            o[c] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
            o[c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
            o[c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
            o[c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
        s = bytes(a ^ b for a, b in zip(o, rk[rnd]))
    s = bytes(_SBOX[s[_SHIFT[i]]] for i in range(16))
    return bytes(a ^ b for a, b in zip(s, rk[-1]))


def _decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    s = bytes(a ^ b for a, b in zip(block, rk[-1]))
    s = bytes(_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16))
    for rnd in range(len(rk) - 2, 0, -1):
        s = bytes(a ^ b for a, b in zip(s, rk[rnd]))
        o = bytearray(16)
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            o[c] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            o[c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            o[c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            o[c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
        s = bytes(_INV_SBOX[o[_INV_SHIFT[i]]] for i in range(16))
    return bytes(a ^ b for a, b in zip(s, rk[0]))


def cbc_encrypt(key: bytes, data: bytes, iv: bytes,
                pad: bool = True) -> bytes:
    """AES-CBC.  ``pad=True`` applies PKCS#7 (PDF's stream/string mode);
    ``pad=False`` requires block-aligned input (the R6 hash rounds and
    the /UE //OE key wrapping use exact 32/64-byte payloads)."""
    if pad:
        p = 16 - len(data) % 16
        data = data + bytes([p]) * p
    elif len(data) % 16:
        raise ValueError("unpadded CBC needs block-aligned input")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = _encrypt_block(
            rk, bytes(a ^ b for a, b in zip(data[i:i + 16], prev)))
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, data: bytes, iv: bytes,
                unpad: bool = True) -> bytes:
    """AES-CBC decrypt.  With ``unpad``, PKCS#7 is stripped only when
    structurally valid — a wrong key yields garbage padding, and the
    caller's downstream parse (flate/lexer) must see the garbage rather
    than an exception escaping the extract batch."""
    if len(data) % 16 or not data:
        return b""
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, blk), prev))
        prev = blk
    if unpad and out:
        p = out[-1]
        if 1 <= p <= 16 and all(b == p for b in out[-p:]):
            del out[-p:]
    return bytes(out)
