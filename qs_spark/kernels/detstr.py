"""Deterministic string/hash helpers shared by corpus generation and the
synthetic OCR kernel.  Everything is a pure function of its inputs (md5-based)
so executors and the oracle agree byte-for-byte, independent of process,
PYTHONHASHSEED, or partitioning.
"""

from __future__ import annotations

import hashlib

# Small fixed vocabulary for synthetic text (overlaps the driver testdata's
# documents.parquet vocabulary so search queries hit both).
VOCAB = (
    "the a spark data table row column key value query filter join merge sort "
    "group agg window hash scan batch stream order part line customer vector "
    "small big fast slow dup index span text page chunk media region block "
    "cell sheet title body nav main footer figure ocr token term score rank"
).split()


def md5_int(*parts: object) -> int:
    """Stable 128-bit integer from the md5 of '|'-joined parts."""
    raw = "|".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.md5(raw).digest(), "big")


def words(seed_parts: tuple, n: int) -> list[str]:
    """n deterministic vocabulary words keyed by seed_parts."""
    out = []
    h = md5_int(*seed_parts)
    for i in range(n):
        h = (h * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(VOCAB[h % len(VOCAB)])
    return out


def sentence(seed_parts: tuple, n_words: int) -> str:
    ws = words(seed_parts, n_words)
    return " ".join(ws) + "."
