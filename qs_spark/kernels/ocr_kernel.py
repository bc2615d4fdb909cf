"""Deterministic synthetic OCR region reader.

The reference routes media pages through EasyOCR
(ref: ameya_parser_pdf whl!.../pdf/extractors/easyocr_extractor.py:36-60):
render page at IMAGE_DPI=300, read text lines, and if nothing was read retry
once at dpi*2.  Real EasyOCR output is model-dependent and non-deterministic
across versions, so the golden contract here is defined over a deterministic
stitcher: the "OCR text" of a media region is a pure function of
(media_ref, dpi).  In production the body of ``ocr_lines`` is the single
swap-point for a real OCR engine; everything around it (retry-at-2x-dpi,
line stitching with a trailing newline per line, empty-page drop) reproduces
the reference walker exactly.
"""

from __future__ import annotations

from qs_spark.kernels.detstr import md5_int, words

DEFAULT_DPI = 300


def ocr_lines(media_ref: str, dpi: int = DEFAULT_DPI) -> list[str]:
    """Deterministic OCR: list of text lines for a media region.

    Failure modes are modeled deterministically so the reference's branches
    are exercised (ref easyocr_extractor.py:50-60):
      - h % 13 == 0  -> unreadable at any dpi (page later dropped)
      - h % 7  == 0  -> empty at dpi 300, readable at the 600-dpi retry
    """
    h = md5_int(media_ref)
    if h % 13 == 0:
        return []
    if h % 7 == 0 and dpi <= DEFAULT_DPI:
        return []
    n_lines = 1 + (h % 4)
    return [
        " ".join(words((media_ref, dpi, i), 3 + (h >> (i + 3)) % 5))
        for i in range(n_lines)
    ]


def stitch_page(media_ref: str) -> str:
    """OCR a media region with the reference's retry + stitch semantics.

    Each line is appended followed by "\\n" (ref easyocr_extractor.py:46-48),
    so a non-empty page text always ends with a newline; an empty result after
    the dpi*2 retry yields "" (the caller drops the page,
    ref easyocr_extractor.py:69-72).
    """
    lines = ocr_lines(media_ref, DEFAULT_DPI)
    if not lines:
        lines = ocr_lines(media_ref, DEFAULT_DPI * 2)
    return "".join(line + "\n" for line in lines)


def stitch_text_lines(text: str) -> str:
    """OCR path for pages that *have* text but carry media/tables: the
    reference renders the page and OCRs it (tables trigger the OCR branch,
    ref easyocr_extractor.py:36).  Deterministic model: the "OCR" reads back
    the page's own lines, stitched with the same trailing-newline rule.
    """
    lines = [line for line in text.split("\n") if line]
    return "".join(line + "\n" for line in lines)
