"""PDF page walker (also serves DOC/DOCX after block->page mapping).

Reproduces the reference walker
(ameya_parser_pdf whl!.../pdf/extractors/easyocr_extractor.py:23-77):

  for each page:
    if page has images or tables  -> render + OCR, lines joined with a
                                     trailing "\\n" each; retry at dpi*2 if
                                     the first pass read nothing
    else                          -> page.get_text()
    emit the page iff its text is non-empty  (empty pages are DROPPED, so
    the position of every later page shifts — `order` is
    position-after-drop, assigned by enumeration in add_metadata,
    ref ameya_dataprocessing_core whl!core/files/utils.py:110-111)

The DOC/DOCX path is `libreoffice --convert-to pdf` followed by this same
walker (ameya_parser_doc whl!.../doc/extractors/easyocr_extractor.py:80-129),
which is why docx blocks map onto pdf page kinds here.

Input raw-span kinds (corpus schema, FIXTURES.md F-1):
  pdf_text   text page                      -> kind 'pdf_text'
  pdf_table  page with a table (OCR route)  -> kind 'ocr' (media presence
             decides kind, ref easyocr_extractor.py:36)
  pdf_figure / ocr_region  media-only page  -> kind 'ocr', media_ref kept
  docx_para  paragraph block                -> treated as pdf_text page
  docx_table table block                    -> treated as pdf_table page
"""

from __future__ import annotations

from qs_spark.kernels.ocr_kernel import stitch_page, stitch_text_lines

_TEXT_KINDS = {"pdf_text", "docx_para"}
_TABLE_KINDS = {"pdf_table", "docx_table"}
_MEDIA_KINDS = {"pdf_figure", "ocr_region", "docx_image"}


def walk_pages(raw_spans: list[dict], plan: str = "basic +") -> list[dict]:
    """Ordered page walk -> list of {kind, text, media_ref} (pre-`order`).

    plan selects the extraction path like the reference's Job.plan
    (consumer extractor.py:80,119; wheel loader.py:40-46):
      'basic +' (the dispatch default for pdf/docx) — OCR-aware walker
      'basic'   — SimpleDirectoryReader text layer only: table pages yield
                  their text layer verbatim (kind 'pdf_text'), figure pages
                  have no text layer and drop
    """
    ocr = plan != "basic"
    out: list[dict] = []
    for sp in raw_spans:
        k = sp["kind"]
        if k in _TEXT_KINDS:
            page_text = sp["text"] or ""
            if page_text:
                out.append({"kind": "pdf_text", "text": page_text, "media_ref": ""})
        elif k in _TABLE_KINDS:
            if ocr:
                page_text = stitch_text_lines(sp["text"] or "")
                if page_text:
                    out.append({"kind": "ocr", "text": page_text, "media_ref": ""})
            else:
                page_text = sp["text"] or ""
                if page_text:
                    out.append({"kind": "pdf_text", "text": page_text, "media_ref": ""})
        elif k in _MEDIA_KINDS:
            if ocr:
                page_text = stitch_page(sp["media_ref"] or "")
                if page_text:
                    out.append(
                        {"kind": "ocr", "text": page_text, "media_ref": sp["media_ref"] or ""}
                    )
            # 'basic': figures have no text layer -> page dropped
        # unknown page kinds: skipped (reference asserts on extension long
        # before the walker; per-page kinds are closed by the corpus schema)
    return out
