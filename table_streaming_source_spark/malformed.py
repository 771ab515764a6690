"""Malformed-input discipline shared by every from-scratch parser.

Decoders and file-format readers in this repo parse untrusted bytes —
media payloads, archive members, container metadata.  At 100 TB one
poisoned blob is a certainty, and the failure contract is:

* a parser either returns or raises ``ValueError`` (or the documented
  ``NotImplementedError`` env gates) — NEVER a leaked ``struct.error``
  / ``IndexError`` / ``KeyError`` / ``zlib.error``, which quarantine
  routing does not catch and which therefore kills the whole scan;
* header-declared sizes must be validated against what the stream can
  actually hold BEFORE any size-driven allocation or loop — a flipped
  dimension byte must not ask an executor for 200 GiB (the
  decompression-bomb guard, PIL's ``MAX_IMAGE_PIXELS`` idea).

Both rules were derived from a truncation/bit-flip/splice fuzz sweep
(`tests/test_decoder_fuzz.py`, `tests/test_source_fuzz.py`) that found
every one of these leak classes in practice.
"""

from __future__ import annotations

import struct
import zlib

#: low-level exceptions a parser can hit on MALFORMED bytes (truncated
#: structs, out-of-range indices/codes, corrupt deflate streams, an
#: exhausted marker scan) — never on valid input, where round-trip
#: property tests pin exact output.
#: TypeError/AttributeError earn their place via the thrift-compact
#: footer walk (a corrupt field type yields an int where a dict
#: belongs); the cost is that CALLER misuse (passing a non-bytes
#: payload) also reads as "malformed" — acceptable for parse entry
#: points whose one job is untrusted bytes.
MALFORMED_EXC = (
    struct.error,
    IndexError,
    KeyError,
    StopIteration,
    OverflowError,
    EOFError,
    UnicodeDecodeError,
    TypeError,
    AttributeError,
    # xml.etree's ParseError subclasses SyntaxError: reachable through
    # a CRC-valid container wrapping malformed XML (xlsx), including
    # expat's own entity-amplification (billion-laughs) rejection
    SyntaxError,
    zlib.error,
)


def quarantinable(fmt: str):
    """Decorator for public ``payload -> parsed`` entry points: any
    low-level parse failure on malformed bytes surfaces as
    ``ValueError`` — the ONE exception type quarantine routing and
    fail-fast error reporting key on."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except MALFORMED_EXC as exc:
                raise ValueError(
                    f"malformed {fmt}: {type(exc).__name__}: {exc}"
                ) from exc
        return wrapper
    return deco


#: decompression-bomb guard: a tiny malformed-or-malicious payload can
#: DECLARE a multi-gigapixel raster; reject before the canvas
#: allocation.  64 MPix is far above any fixture and most real-world
#: stills; a pipeline that needs more raises it consciously.
MAX_DECODE_PIXELS = 1 << 26


def check_dims(width: int, height: int, fmt: str) -> None:
    """Reject impossible or bomb-sized raster dimensions BEFORE any
    dims-driven allocation (found by the decoder fuzz sweep: a flipped
    IHDR/SOF byte asked for a 464 PiB canvas)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"{fmt} with non-positive dimensions")
    if width * height > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{fmt} dimensions {width}x{height} exceed the "
            f"decompression-bomb guard ({MAX_DECODE_PIXELS} px)"
        )


#: single-stream inflate ceiling when the format declares no expected
#: size (gzip ISIZE is a trailer, Avro OCF blocks declare only their
#: COMPRESSED length).  DEFLATE expands at most ~1032x, so a bomb needs
#: a proportionally large input to pass this — 256 MiB is far above any
#: fixture or sane block and bounds one task's memory.
MAX_INFLATE_BYTES = 1 << 28


def bounded_inflate(
    data: bytes,
    *,
    declared: int | None = None,
    fmt: str = "deflate stream",
    wbits: int = -15,
) -> bytes:
    """Inflate with the decompression-bomb guard applied WHILE
    inflating, never after: with ``declared`` the output must be
    exactly that many bytes (``max_length = declared + 1`` detects
    over-production without materializing it); without it the output
    is capped at :data:`MAX_INFLATE_BYTES`.  Raises ``ValueError`` on
    any mismatch — the quarantine contract."""
    if declared is not None and declared < 0:
        raise ValueError(f"{fmt}: negative declared size")
    d = zlib.decompressobj(wbits)
    cap = (declared + 1) if declared is not None else (
        MAX_INFLATE_BYTES + 1
    )
    try:
        out = d.decompress(data, cap)
    except zlib.error as exc:
        raise ValueError(f"{fmt}: {exc}") from exc
    if declared is not None:
        if len(out) != declared:
            raise ValueError(
                f"{fmt}: inflated {len(out)} bytes, declared {declared}"
            )
    elif len(out) > MAX_INFLATE_BYTES:
        raise ValueError(
            f"{fmt}: inflate exceeds the bomb guard "
            f"({MAX_INFLATE_BYTES} bytes)"
        )
    return out
