"""ISO-BMFF (MP4) container parsing — real box-structure walk, stdlib only.

Closes the container half of the mp4 stub honestly: the repo still does NOT
decode video frames (h.264/h.265 entropy decode is genuinely out of scope
without a codec library — that part stays a documented stub), but the
CONTAINER is a real format the stdlib can parse, exactly like wav/bmp/png.
parse_mp4_meta walks the box tree (size/type headers, 64-bit largesize,
nested moov/trak) and extracts the metadata a training pipeline needs —
duration from mvhd timescale/duration, dimensions from the video tkhd
(16.16 fixed point), brand from ftyp, mdat spans — without touching codec
payload.  build_mp4 assembles a minimal conformant file (ftyp+moov+mdat)
for the deterministic synthetic corpus, so the parser is exercised on real
boxes end-to-end.
"""

from __future__ import annotations

import struct


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(version: int, flags: int) -> bytes:
    return struct.pack(">I", (version << 24) | flags)


def build_mp4(
    duration_ms: int, width: int, height: int, mdat: bytes, timescale: int = 1000
) -> bytes:
    """Minimal conformant MP4: ftyp(isom) + moov(mvhd + trak(tkhd)) + mdat.
    Durations are expressed in `timescale` units (default 1000 = ms)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    dur = duration_ms * timescale // 1000
    mvhd = _box(
        b"mvhd",
        _full(0, 0)
        + struct.pack(">IIII", 0, 0, timescale, dur)  # ctime mtime scale dur
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)  # rate volume reserved
        + b"\x00" * 8  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # predefined
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        _full(0, 7)  # enabled | in-movie | in-preview
        + struct.pack(">IIII", 0, 0, 1, 0)  # ctime mtime track_id reserved
        + struct.pack(">I", dur)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer group volume reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    return ftyp + moov + _box(b"mdat", mdat)


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def walk_boxes(payload: bytes, start: int = 0, end: int | None = None):
    """Yield (type, body_start, body_end, depth) over the box tree."""
    n = len(payload) if end is None else end
    stack = [(start, n, 0)]
    while stack:
        pos, limit, depth = stack.pop()
        while pos + 8 <= limit:
            size, typ = struct.unpack_from(">I4s", payload, pos)
            hdr = 8
            if size == 1:
                if pos + 16 > limit:
                    break
                size = struct.unpack_from(">Q", payload, pos + 8)[0]
                hdr = 16
            elif size == 0:
                size = limit - pos  # box extends to end of enclosing scope
            if size < hdr or pos + size > limit:
                break  # malformed: stop scanning this scope, not the file
            yield typ, pos + hdr, pos + size, depth
            if typ in _CONTAINERS:
                stack.append((pos + size, limit, depth))
                pos, limit, depth = pos + hdr, pos + size, depth + 1
                continue
            pos += size


def parse_mp4_meta(payload: bytes) -> dict:
    """Container metadata from the box tree: {brand, timescale, duration_ms,
    width, height, n_tracks, mdat_bytes}.  Raises ValueError when the
    payload carries no ISO-BMFF box structure."""
    meta = {
        "brand": None,
        "timescale": None,
        "duration_ms": None,
        "width": None,
        "height": None,
        "n_tracks": 0,
        "mdat_bytes": 0,
    }
    saw_box = False
    for typ, b0, b1, _depth in walk_boxes(payload):
        saw_box = True
        if typ == b"ftyp" and b1 - b0 >= 4:
            meta["brand"] = payload[b0 : b0 + 4].decode("latin-1")
        elif typ == b"mvhd" and b1 - b0 >= 20:
            version = payload[b0]
            if version == 0:
                ts, dur = struct.unpack_from(">II", payload, b0 + 12)
            elif b1 - b0 >= 32:  # version 1: 64-bit times need a longer body
                ts = struct.unpack_from(">I", payload, b0 + 20)[0]
                dur = struct.unpack_from(">Q", payload, b0 + 24)[0]
            else:
                continue  # malformed v1 mvhd: too short for its own fields
            meta["timescale"] = ts
            if ts:
                meta["duration_ms"] = int(dur * 1000 // ts)
        elif typ == b"tkhd":
            meta["n_tracks"] += 1
            version = payload[b0]
            # width/height are the LAST 8 bytes of tkhd in both versions
            if b1 - b0 >= 8 and version in (0, 1):
                w_fx, h_fx = struct.unpack_from(">II", payload, b1 - 8)
                if w_fx and h_fx and meta["width"] is None:
                    meta["width"] = w_fx >> 16
                    meta["height"] = h_fx >> 16
        elif typ == b"mdat":
            meta["mdat_bytes"] += b1 - b0
    if not saw_box:
        raise ValueError("not an ISO-BMFF payload (no parseable boxes)")
    return meta


def extract_mdat(payload: bytes) -> bytes:
    """Concatenated codec payload (mdat bodies) — the honest 'decoded
    stream' stand-in: container fully parsed, elementary stream NOT
    entropy-decoded (needs a video codec; documented stub boundary)."""
    parts = [payload[b0:b1] for typ, b0, b1, _ in walk_boxes(payload) if typ == b"mdat"]
    if not parts:
        raise ValueError("no mdat box")
    return b"".join(parts)
