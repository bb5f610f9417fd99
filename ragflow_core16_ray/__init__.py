"""ragflow_core16_ray — a Ray-Data-native main-content-extraction engine.

A from-scratch reimplementation of the *capabilities* of RAGFlow's DeepDoc
document-understanding stack (reference studied read-only at /root/reference;
see SURVEY.md) expressed as ``ray.data.Dataset`` pipelines of ``map_batches``
over zero-copy Arrow batches:

- HTML boilerplate stripping (text-density + link-density DOM scoring,
  Readability/jusText-style, implemented from scratch —
  reference: deepdoc/parser/html_parser.py:30-50 behavior).
- PDF-like layout parsing over pre-OCR box spans: garbage filtering,
  repeated header/footer removal, reading-order recovery (incl. two-column),
  ToC removal, text merging, table reconstruction, caption attachment
  (reference behaviors: deepdoc/vision/layout_recognizer.py:60-157,
  deepdoc/parser/pdf_parser.py:182-294,365-867).
- Chunking templates naive / book / paper / table / md
  (reference: rag/app/{naive,book,paper,table}.py, rag/nlp/__init__.py).
- Training-data-scale operations: exact/MinHash-LSH/SimHash/n-gram-Jaccard
  dedup, embedding similarity search, text analysis (lang-id, quality,
  token counts, fingerprints), multimodal plumbing.

Everything here derives from public knowledge only: the Ray Data / pyarrow
APIs and the published Readability / MinHash / SimHash algorithm families.

IMPORTANT: no module in this package calls ``ray.init()`` — the driver,
``bench.py``, or the test fixture owns the Ray session.
"""

__version__ = "0.1.0"
