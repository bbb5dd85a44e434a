"""Pure-Python BCJ2 (x86 branch converter, 4-stream) codec.

BCJ2 is 7-Zip's stronger x86 filter: instead of rewriting branch
targets in place (BCJ), it SPLITS the input into four streams — a
main stream holding everything except converted 4-byte branch
fields, a call stream holding absolute targets of converted ``E8``
CALLs (big-endian), a jump stream holding absolute targets of
converted ``E9`` JMPs and ``0F 8x`` Jcc's, and a range-coded control
stream of one bit per branch opcode saying whether its field was
converted. The reference ingests such archives through
commons-compress (`net2demy/src/main/scala/Execute.scala:25-26,319`).

This module implements the public-domain format from the LZMA SDK
(``Bcj2.h`` / ``Bcj2Dec.c``, Igor Pavlov, public domain; the range
coder is LZMA's standard 11-bit-model / 5-move-bit binary coder).
Original implementation from the published spec — no SDK code is
copied.

Wire facts the implementation encodes:

- A "branch opcode" at output position ``m`` is a byte ``b`` with
  ``(b & 0xFE) == 0xE8``, or ``b in 0x80..0x8F`` preceded by ``0x0F``
  (prev byte taken from the OUTPUT, so a converted field's last byte
  participates in detection of the next opcode).
- One probability slot per context: 256 slots for ``E8`` keyed by the
  previous output byte, one for ``E9``, one for Jcc (the slot LAYOUT
  is internal; any bijective context->slot map is wire-compatible).
- A converted field at output position ``m+1`` stores
  ``absolute = rel32 + (m + 5)`` big-endian in call/jump; the decoder
  writes ``rel32 = absolute - (field_pos + 4)`` little-endian.
- The control stream begins with the range coder's pad byte (always
  0) and is consumed 5 bytes up front, then one byte per
  normalisation.

Safety: decoders only ever run under the 7z container's CRC checks
(sevenzip.py verifies folder/substream digests), so a malformed or
misunderstood stream surfaces as a loud ``ValueError``, never a
silent wrong extraction. Tail markers (a branch opcode within the
final 4 output bytes) still consume a control bit, matching the SDK
decoder's loop structure; the encoder here never converts them.
"""

from __future__ import annotations

_TOP = 1 << 24  # range-coder renormalisation threshold
_MODEL_TOTAL = 1 << 11  # 11-bit probability models
_MOVE_BITS = 5
_N_PROBS = 256 + 2  # [0..255] E8 keyed by prev byte, [256] E9, [257] Jcc
_MASK32 = 0xFFFFFFFF


def _is_branch(prev: int, b: int) -> bool:
    return (b & 0xFE) == 0xE8 or (prev == 0x0F and (b & 0xF0) == 0x80)


def _prob_index(prev: int, b: int) -> int:
    if b == 0xE8:
        return prev
    return 256 if b == 0xE9 else 257


def bcj2_decode(
    main: bytes, call: bytes, jump: bytes, rc: bytes, out_size: int
) -> bytes:
    """Recombine the four BCJ2 streams into ``out_size`` output bytes.

    Raises ``ValueError`` when any stream exhausts early — under the
    7z container that is the same corrupt-archive class as a CRC
    mismatch.
    """
    if out_size == 0:
        return b""
    if len(rc) < 5:
        raise ValueError("BCJ2 control stream shorter than the 5-byte init")
    probs = [_MODEL_TOTAL >> 1] * _N_PROBS
    code = 0
    rng = _MASK32
    rpos = 0
    for _ in range(5):  # pad byte + 4 payload bytes (SDK RC_INIT2)
        code = ((code << 8) | rc[rpos]) & _MASK32
        rpos += 1

    out = bytearray()
    mpos = cpos = jpos = 0
    prev = 0
    while len(out) < out_size:
        if mpos == len(main):
            raise ValueError(
                "BCJ2 main stream exhausted before the declared output size"
            )
        b = main[mpos]
        mpos += 1
        out.append(b)
        if not _is_branch(prev, b):
            prev = b
            continue
        # one control bit per branch opcode (even a tail one)
        idx = _prob_index(prev, b)
        ttt = probs[idx]
        bound = (rng >> 11) * ttt
        if code < bound:
            rng = bound
            probs[idx] = ttt + ((_MODEL_TOTAL - ttt) >> _MOVE_BITS)
            bit = 0
        else:
            rng -= bound
            code = (code - bound) & _MASK32
            probs[idx] = ttt - (ttt >> _MOVE_BITS)
            bit = 1
        if rng < _TOP:
            if rpos == len(rc):
                raise ValueError("BCJ2 control stream exhausted")
            rng = (rng << 8) & _MASK32
            code = ((code << 8) | rc[rpos]) & _MASK32
            rpos += 1
        if not bit:
            prev = b
            continue
        # converted: 4 big-endian absolute bytes from call (E8) / jump
        if b == 0xE8:
            src, pos, cpos = call, cpos, cpos + 4
        else:
            src, pos, jpos = jump, jpos, jpos + 4
        if pos + 4 > len(src):
            raise ValueError("BCJ2 call/jump stream exhausted")
        absolute = int.from_bytes(src[pos : pos + 4], "big")
        rel = (absolute - (len(out) + 4)) & _MASK32
        field = rel.to_bytes(4, "little")
        room = out_size - len(out)
        out += field[:room]  # the SDK decoder truncates a tail field
        prev = field[3]
    return bytes(out)


class _RangeEncoder:
    """LZMA's carry-propagating binary range encoder (encode side of
    the decoder above; used by :func:`bcj2_encode` for fixtures and
    roundtrip tests)."""

    def __init__(self) -> None:
        self.low = 0  # < 2**33: carries absorbed by _shift_low
        self.range = _MASK32
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def encode_bit(self, probs: list[int], idx: int, bit: int) -> None:
        ttt = probs[idx]
        bound = (self.range >> 11) * ttt
        if not bit:
            self.range = bound
            probs[idx] = ttt + ((_MODEL_TOTAL - ttt) >> _MOVE_BITS)
        else:
            self.low += bound
            self.range -= bound
            probs[idx] = ttt - (ttt >> _MOVE_BITS)
        while self.range < _TOP:
            self.range = (self.range << 8) & _MASK32
            self._shift_low()

    def _shift_low(self) -> None:
        if self.low < 0xFF000000 or self.low > _MASK32:
            carry = self.low >> 32
            self.out.append((self.cache + carry) & 0xFF)
            self.out.extend(
                ((0xFF + carry) & 0xFF,) * (self.cache_size - 1)
            )
            self.cache = (self.low >> 24) & 0xFF
            self.cache_size = 0
        self.cache_size += 1
        self.low = (self.low << 8) & _MASK32

    def flush(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


def bcj2_encode(
    data: bytes, *, convert=None
) -> tuple[bytes, bytes, bytes, bytes]:
    """Split ``data`` into the four BCJ2 streams
    ``(main, call, jump, rc)``.

    ``convert(pos)`` (optional) decides whether the branch opcode at
    input position ``pos`` has its 4-byte field converted; the default
    converts every branch whose field fits. Branch opcodes within the
    final 4 bytes are never converted but still cost a control bit,
    mirroring the decoder. ``bcj2_decode(*streams, len(data))`` is the
    exact inverse for any input.
    """
    main = bytearray()
    call = bytearray()
    jump = bytearray()
    enc = _RangeEncoder()
    probs = [_MODEL_TOTAL >> 1] * _N_PROBS
    prev = 0
    pos = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        main.append(b)
        if not _is_branch(prev, b):
            prev = b
            pos += 1
            continue
        fits = pos + 5 <= n
        do_convert = fits and (convert is None or bool(convert(pos)))
        enc.encode_bit(probs, _prob_index(prev, b), 1 if do_convert else 0)
        if not do_convert:
            prev = b
            pos += 1
            continue
        rel = int.from_bytes(data[pos + 1 : pos + 5], "little")
        absolute = (rel + pos + 5) & _MASK32
        (call if b == 0xE8 else jump).extend(absolute.to_bytes(4, "big"))
        prev = data[pos + 4]
        pos += 5
    return bytes(main), bytes(call), bytes(jump), enc.flush()
